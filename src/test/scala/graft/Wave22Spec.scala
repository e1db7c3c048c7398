package graft

import graft.queries.Breadth22
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the twenty-second wave (Breadth22 — Wilder's
  * directional movement system). */
class Wave22Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long, String)]) =
    rows.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", lit("{}"))

  private def day(i: Int) = f"2024-01-$i%02d 10:00:00"

  private def series(vals: Seq[Double], key: Long = 1L) =
    vals.zipWithIndex.map { case (v, i) => (key, v, i.toLong + 1, day(i + 1)) }

  test("adx: a strictly rising ladder is pure +DM — DI+ = 100, DI- = 0, " +
    "DX = 100, ADX = 100 once seeded (n = 3: DX from bar 4, ADX from bar 6)") {
    val got = Breadth22.adxSeries(ticks(series(
      Seq(10.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0, 17.0))),
      "user_id", "ts", "value", "event_id")
      .orderBy("day")
      .select("di_plus", "di_minus", "dx", "adx")
      .as[(Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(got.size === 8)
    // bars 1-3: warm-up (j < 3), everything null
    assert(got.take(3).forall(_ === ((None, None, None, None))))
    // bars 4+: DI+ = 100, DI- = 0, DX = 100 (every diff is +100 cents)
    assert(got.drop(3).forall(t =>
      t._1 === Some(100.0) && t._2 === Some(0.0) && t._3 === Some(100.0)))
    // ADX warm-up: bars 4-5 have 1 and 2 DX values, seed mean at bar 6
    assert(got(3)._4 === None && got(4)._4 === None)
    assert(got.drop(5).forall(_._4 === Some(100.0)))
  }

  test("adx: a flat series never scores (zero TR, zero DM: DI and DX " +
    "undefined on every bar)") {
    val got = Breadth22.adxSeries(ticks(series(Seq.fill(7)(10.0), key = 2L)),
      "user_id", "ts", "value", "event_id")
      .select("di_plus", "di_minus", "dx", "adx")
      .as[(Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(got.size === 7)
    assert(got.forall(_ === ((None, None, None, None))))
  }

  test("adx: an up-then-down reversal scores both DI sides and ADX blends " +
    "the DX series with the (prev*2 + dx)/3 recurrence — hand fold pinned") {
    // closes (cents): one tick per day, H = L = C, so +DM/−DM are close
    // diffs and TR = |close diff|
    val cents = Seq(1000L, 1100L, 1250L, 1180L, 1400L, 1300L, 1150L, 1420L)
    val got = Breadth22.adxSeries(
      ticks(series(cents.map(_.toDouble / 100.0))),
      "user_id", "ts", "value", "event_id")
      .orderBy("day")
      .select("di_plus", "di_minus", "dx", "adx")
      .as[(Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    // the same fold, stepped by hand through the shared step function
    var st: Option[Breadth22.AdxAcc] = None
    val want = cents.map { c =>
      val a = Breadth22.adxStep(st, c, c, c)
      st = Some(a)
      Breadth22.adxOut(a)
    }
    assert(got === want)
    // sanity on the fixture: both DI sides strictly positive once scored
    assert(got.drop(3).forall(t => t._1.get > 0 && t._2.get > 0))
    // ADX present from the 6th bar (3rd defined DX) on
    assert(got.drop(5).forall(_._4.isDefined))
  }

  test("adx: DX skips bars where both smoothed DMs are zero (they do not " +
    "advance the ADX warm-up)") {
    // three equal bars then a jump: the first scored bars have +DM only
    // after the jump; before it, apdm = amdm = 0 -> DX undefined
    val cents = Seq(1000L, 1000L, 1000L, 1000L, 1300L, 1350L, 1400L, 1450L)
    val got = Breadth22.adxSeries(
      ticks(series(cents.map(_.toDouble / 100.0))),
      "user_id", "ts", "value", "event_id")
      .orderBy("day")
      .select("di_plus", "di_minus", "dx", "adx")
      .as[(Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    // bar 4 (j = 3): averages seeded but all-zero -> DI defined only if
    // atr > 0; here TR = 0 on flat bars so atr = 0 -> DI null, DX null
    assert(got(3) === ((None, None, None, None)))
    // bars 5-7: DX defined (pure +DM); ADX seeds at the 3rd DX = bar 7
    assert(got(4)._3.isDefined && got(5)._3.isDefined)
    assert(got(4)._4 === None && got(5)._4 === None)
    assert(got(6)._4.isDefined)
    // DX on those bars is ~100 (amdm stays exactly 0; the emitted value
    // is (100·x)/x which rounds once, so ±1 ulp of 100)
    assert(got.slice(4, 8).forall(t => math.abs(t._3.get - 100.0) < 1e-9))
  }
}
