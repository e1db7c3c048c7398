package graft

import graft.queries.Breadth27
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the twenty-seventh wave (Breadth27
  * volume-flow indicators). */
class Wave27Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long, String, Long)]) =
    rows.toDF("user_id", "value", "event_id", "at", "k")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", concat(lit("{\"k\":"), col("k"), lit("}")))
      .drop("k")

  private def day(i: Int) = f"2024-01-$i%02d 10:00:00"

  private def singleTicks(closes: Seq[Long], qtys: Seq[Long], key: Long = 1L) =
    closes.zip(qtys).zipWithIndex.map { case ((c, q), i) =>
      (key, c.toDouble / 100.0, i.toLong + 1, day(i + 1), q)
    }

  test("dpo: a perfectly linear series detrends to the constant " +
    "-(shift - (w-1)/2) x slope, scored only past both warm-ups") {
    // closes 1000+100t for 10 days, w=8, shift=5:
    // dpo = C_{t-5} - SMA_8 = -150 cents = -1.50 on every scored bar
    val closes = (0 until 10).map(i => 1000L + 100L * i)
    val got = Breadth27.dpo(
      ticks(singleTicks(closes, Seq.fill(10)(1L))),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("dpo_num", "dpo")
      .as[(Long, Double)].collect().toSeq
    assert(got === Seq.fill(3)((-1200L, -1.5)))
  }

  test("cmf: all-doji windows pin cmf = 0 (H=L contributes zero money " +
    "flow), and an all-accumulation fixture pins cmf = 1 exactly") {
    // key 1: single-tick days -> every bar is a doji -> cmf 0
    val doji = singleTicks(Seq.fill(6)(1000L), Seq.fill(6)(7L))
    // key 2: each day ticks 10.00 -> 11.00 -> 12.00 (close = high) with
    // per-tick qty 5 -> mfm = +1 -> mfv_q = 1e6 * v -> cmf = 1.0
    val accum = (1 to 6).flatMap { d =>
      Seq((2L, 10.0, d * 10L + 1, day(d), 5L),
        (2L, 11.0, d * 10L + 2, day(d), 5L),
        (2L, 12.0, d * 10L + 3, day(d), 5L))
    }
    val got = Breadth27.cmf(ticks(doji ++ accum), "user_id", "ts", "value",
      "event_id", "k")
      .orderBy("user_id", "day")
      .select("user_id", "sum_mfv_q", "sum_vol", "cmf")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val k1 = got.filter(_._1 == 1L)
    val k2 = got.filter(_._1 == 2L)
    assert(k1.length === 2 && k2.length === 2) // 6 bars, 5-bar windows
    assert(k1.forall(t => t._2 === 0L && t._3 === 35L && t._4 === 0.0))
    assert(k2.forall(t => t._2 === 75000000L && t._3 === 75L && t._4 === 1.0))
  }

  test("forceIndex: the hand fold pins raw day-move x volume and its " +
    "seeded EMA13, with the first bar unscored") {
    val closes = Seq(1000L, 1100L, 1050L, 1200L)
    val vols = Seq(10L, 20L, 30L, 5L)
    val got = Breadth27.forceIndex(
      ticks(singleTicks(closes, vols)),
      "user_id", "ts", "value", "event_id", "k")
      .orderBy("day").select("fi_raw", "fi_ema13")
      .as[(Long, Double)].collect().toSeq
    var st: Option[Breadth27.FiAcc] = None
    val want = closes.zip(vols).flatMap { case (c, v) =>
      st = Some(Breadth27.fiStep(st, c, v))
      st.get.fi.map(f => (f, st.get.ema.get))
    }
    assert(got === want)
    assert(got.head === ((2000L, 2000.0))) // (1100-1000)*20, EMA seed
  }

  test("adlChaikin: the hand fold pins the integer ADL running sum and " +
    "the EMA3-EMA10 oscillator, seeding at osc = 0") {
    // alternating accumulation/distribution days: ticks low->high->close
    val bars = Seq( // (ticks of the day, qty per tick)
      Seq(10.0, 12.0, 12.0), Seq(12.0, 10.0, 10.0), Seq(10.0, 12.0, 11.0))
    val rows = bars.zipWithIndex.flatMap { case (vs, d) =>
      vs.zipWithIndex.map { case (v, j) =>
        (1L, v, d * 10L + j + 1, day(d + 1), 4L) }
    }
    val got = Breadth27.adlChaikin(ticks(rows), "user_id", "ts", "value",
      "event_id", "k")
      .orderBy("day").select("adl_q", "adl", "chaikin_osc")
      .as[(Long, Double, Double)].collect().toSeq
    // hand mfv_q per bar: v=12 each day
    // day1: H=1200 L=1000 C=1200 -> mfm +1 -> +12e6
    // day2: H=1200 L=1000 C=1000 -> mfm -1 -> -12e6
    // day3: H=1200 L=1000 C=1100 -> mfm 0 -> 0
    var st: Option[Breadth27.AdlAcc] = None
    val want = Seq(12000000L, -12000000L, 0L).map { m =>
      st = Some(Breadth27.adlStep(st, m))
      (st.get.adlQ, st.get.adlQ.toDouble / 1.0e6,
        (st.get.e3 - st.get.e10) / 1.0e6)
    }
    assert(got === want)
    assert(got.head._3 === 0.0) // seed day: e3 = e10 = adl
  }
}
