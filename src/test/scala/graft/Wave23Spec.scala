package graft

import graft.queries.Breadth23
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the twenty-third wave (Breadth23 — TSI and
  * Supertrend recurrences). */
class Wave23Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long, String)]) =
    rows.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", lit("{}"))

  private def day(i: Int) = f"2024-01-$i%02d 10:00:00"

  private def series(vals: Seq[Double], key: Long = 1L) =
    vals.zipWithIndex.map { case (v, i) => (key, v, i.toLong + 1, day(i + 1)) }

  test("tsi: constant momentum saturates at +100 (every smoothed momentum " +
    "equals its absolute twin); flat series never scores") {
    // strictly rising by the same step: mom = |mom| at every bar, so the
    // double-smoothed ratio is exactly 100 from the first diff on
    val got = Breadth23.tsiSeries(ticks(series(
      Seq(10.0, 11.0, 12.0, 13.0, 14.0, 15.0))),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("tsi").as[Option[Double]].collect().toSeq
    assert(got.head === None) // first bar: no momentum yet
    assert(got.tail.forall(_ === Some(100.0)))
    // flat: |mom| smoothing stays 0 -> unscored on every bar
    val flat = Breadth23.tsiSeries(ticks(series(Seq.fill(5)(10.0), key = 2L)),
      "user_id", "ts", "value", "event_id")
      .select("tsi").as[Option[Double]].collect().toSeq
    assert(flat.forall(_ === None))
  }

  test("tsi: a reversal pulls the index below 100 and the hand fold pins " +
    "every emitted value") {
    val cents = Seq(1000L, 1100L, 1250L, 1180L, 1400L, 1300L, 1150L, 1420L)
    val got = Breadth23.tsiSeries(
      ticks(series(cents.map(_.toDouble / 100.0))),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("tsi").as[Option[Double]].collect().toSeq
    var st: Option[Breadth23.TsiAcc] = None
    val want = cents.map { c =>
      val a = Breadth23.tsiStep(st, c)
      st = Some(a)
      Breadth23.tsiOut(a)
    }
    assert(got === want)
    // the first down move must drag TSI strictly below 100
    assert(got(3).get < 100.0 && got(3).get > -100.0)
  }

  test("supertrend: warm-up rows are dropped, a monotone rally flips the " +
    "trend up and ratchets the lower band monotonically") {
    // one tick per day (H = L = C): TR = |close diff|
    val cents = Seq(1000L, 1010L, 1020L, 1400L, 1800L, 2200L, 2600L, 3000L)
    val got = Breadth23.supertrendSeries(
      ticks(series(cents.map(_.toDouble / 100.0))),
      "user_id", "ts", "value", "event_id")
      .orderBy("day")
      .select("day", "atr", "band_upper", "band_lower", "trend", "supertrend")
      .as[(java.sql.Date, Double, Double, Double, String, Double)]
      .collect().toSeq
    // bars 1-2 are ATR warm-up -> dropped; 6 banded rows remain
    assert(got.size === cents.size - (Breadth23.StAtrN - 1))
    assert(got.head._1 === java.sql.Date.valueOf("2024-01-03"))
    // the hand fold pins every row
    var st: Option[Breadth23.StAcc] = None
    val want = cents.flatMap { c =>
      val a = Breadth23.supertrendStep(st, c, c, c)
      st = Some(a)
      a.atr.map(v => (v, a.fub.get, a.flb.get,
        if (a.up.get) "up" else "down",
        if (a.up.get) a.flb.get else a.fub.get))
    }
    assert(got.map(t => (t._2, t._3, t._4, t._5, t._6)) === want)
    // a strong rally ends in an uptrend riding the lower band...
    assert(got.last._5 === "up" && got.last._6 === got.last._4)
    // ...and once up, the ratcheted lower band never falls
    val upRows = got.dropWhile(_._5 == "down")
    assert(upRows.map(_._4) === upRows.map(_._4).sorted)
  }

  test("supertrend: a collapse flips the trend down onto the upper band") {
    val cents = Seq(3000L, 2990L, 2980L, 2500L, 2000L, 1500L)
    val got = Breadth23.supertrendSeries(
      ticks(series(cents.map(_.toDouble / 100.0))),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("trend", "supertrend", "band_upper")
      .as[(String, Double, Double)].collect().toSeq
    assert(got.last._1 === "down" && got.last._2 === got.last._3)
  }
}
