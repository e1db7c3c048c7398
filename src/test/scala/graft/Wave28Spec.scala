package graft

import graft.queries.Breadth28
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the twenty-eighth wave (Breadth28
  * adaptive/smoothed momentum). */
class Wave28Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long, String, Long)]) =
    rows.toDF("user_id", "value", "event_id", "at", "k")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", concat(lit("{\"k\":"), col("k"), lit("}")))
      .drop("k")

  private def day(i: Int) = f"2024-01-$i%02d 10:00:00"

  private def series(closes: Seq[Long], qtys: Seq[Long], key: Long = 1L) =
    closes.zip(qtys).zipWithIndex.map { case ((c, q), i) =>
      (key, c.toDouble / 100.0, i.toLong + 1, day(i + 1), q)
    }

  test("nviPvi: the hand fold pins both indices — NVI moves only on " +
    "volume-down days, PVI only on volume-up days, neither on a tie") {
    val closes = Seq(1000L, 1100L, 1210L, 1100L, 1155L)
    val vols = Seq(10L, 5L, 20L, 20L, 8L) // down, up, tie, down
    val got = Breadth28.nviPvi(ticks(series(closes, vols)),
      "user_id", "ts", "value", "event_id", "k")
      .orderBy("day").select("nvi", "pvi")
      .as[(Double, Double)].collect().toSeq
    var st: Option[Breadth28.NviAcc] = None
    val want = closes.zip(vols).map { case (c, v) =>
      st = Some(Breadth28.nviStep(st, c, v))
      (st.get.nvi, st.get.pvi)
    }
    assert(got === want)
    // day2: vol down 10->5, +10% move -> NVI 1100, PVI frozen
    assert(got(1) === ((1100.0, 1000.0)))
    // day3: vol up, +10% -> PVI 1100 ; day4: tie -> unchanged
    assert(got(2) === ((1100.0, 1100.0)))
    assert(got(3) === got(2))
    assert(got(4)._1 !== got(3)._1) // day5: vol down moves NVI again
  }

  test("trix: a constant series pins e3 = close and trix = 0 after the " +
    "seed; the hand fold pins a moving series") {
    val flat = Breadth28.trix(
      ticks(series(Seq.fill(4)(1200L), Seq.fill(4)(1L))),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("e3", "trix")
      .as[(Double, Option[Double])].collect().toSeq
    assert(flat.head === ((1200.0, None)))
    assert(flat.tail.forall(_ === ((1200.0, Some(0.0)))))
    val closes = Seq(1000L, 1100L, 1050L, 1200L)
    val got = Breadth28.trix(
      ticks(series(closes, Seq.fill(4)(1L), key = 2L)),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("e3", "trix")
      .as[(Double, Option[Double])].collect().toSeq
    var st: Option[Breadth28.TrixAcc] = None
    val want = closes.map { c =>
      val a = Breadth28.trixStep(st, c)
      val o = Breadth28.trixOut(st, a)
      st = Some(a)
      (a.e3, o)
    }
    assert(got === want)
  }

  test("dema: a constant series pins dema = close/100 everywhere; the " +
    "hand fold pins a moving series") {
    val flat = Breadth28.dema(
      ticks(series(Seq.fill(4)(1200L), Seq.fill(4)(1L))),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("dema").as[Double].collect().toSeq
    assert(flat.forall(_ === 12.0)) // 2·c − c = c, /100
    val closes = Seq(1000L, 1100L, 1050L, 1200L)
    val got = Breadth28.dema(
      ticks(series(closes, Seq.fill(4)(1L), key = 2L)),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("dema").as[Double].collect().toSeq
    var st: Option[Breadth28.DemaAcc] = None
    val want = closes.map { c =>
      val a = Breadth28.demaStep(st, c)
      st = Some(a)
      (2.0 * a.e1 - a.e2) / 100.0
    }
    assert(got === want)
  }

  test("kama: warm-up rows are dropped, the first full-window bar seeds " +
    "at its close, and a flat window uses the slow coefficient exactly") {
    // 8 bars: first 6 rising, then flat. w = 5.
    val closes = Seq(1000L, 1100L, 1200L, 1300L, 1400L, 1500L, 1500L, 1500L)
    val got = Breadth28.kama(
      ticks(series(closes, Seq.fill(8)(1L))),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("kama")
      .as[Double].collect().toSeq
    assert(got.length === 3) // bars 6, 7, 8
    assert(got.head === 15.0) // seed = close/100
    var st: Option[Breadth28.KamaAcc] = None
    val want = closes.flatMap { c =>
      st = Some(Breadth28.kamaStep(st, c))
      st.get.kama.map(_ / 100.0)
    }
    assert(got === want)
    // bars 7/8: c == kama -> the adaptive update is exactly a no-op
    assert(got(1) === 15.0 && got(2) === 15.0)
  }

  test("massIndex: constant-range bars pin ratio 1 (sum = w), and the " +
    "hand fold pins a varying-range series") {
    // every day: two ticks 10.00 / 11.00 -> range 100 on every bar
    val const = (1 to 9).flatMap { d =>
      Seq((1L, 10.0, d * 10L + 1, day(d), 1L),
        (1L, 11.0, d * 10L + 2, day(d), 1L))
    }
    val got = Breadth28.massIndex(ticks(const), "user_id", "ts", "value",
      "event_id")
      .orderBy("day").select("sum_ratio_q", "mass_index")
      .as[(Long, Double)].collect().toSeq
    assert(got.length === 3) // 9 bars, 7-bar windows
    assert(got.forall(_ === ((7L * 100000000L, 7.0))))
  }
}
