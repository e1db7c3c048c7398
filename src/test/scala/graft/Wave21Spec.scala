package graft

import graft.queries.Breadth21
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the twenty-first wave (Breadth21 window-form
  * channel/oscillator indicators over daily bars). */
class Wave21Spec extends SparkSpec {
  import spark.implicits._

  /** One tick per day (O = H = L = C) unless a day repeats. */
  private def ticks(rows: Seq[(Long, Double, Long, String)],
                    props: Map[Long, String] = Map.empty) =
    rows.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", coalesce(
        typedLit(props).apply(col("event_id")), lit("{}")))

  private def day(i: Int) = f"2024-01-$i%02d 10:00:00"

  test("donchian: prior-window band, breakout flags, midline") {
    // closes (cents): 1000 1200 900 1100 1050 | 1250 | 800
    val rows = Seq(10.00, 12.00, 9.00, 11.00, 10.50, 12.50, 8.00)
      .zipWithIndex.map { case (v, i) => (1L, v, i.toLong + 1, day(i + 1)) }
    val got = Breadth21.donchian(ticks(rows), "user_id", "ts", "value",
      "event_id", 5).orderBy("day")
      .select("day", "close_cents", "don_hi_cents", "don_lo_cents",
        "don_mid", "break_up", "break_dn")
      .as[(java.sql.Date, Long, Long, Long, Double, Boolean, Boolean)]
      .collect().toSeq
    // only days 6 and 7 have a full 5-bar prior window
    assert(got.map(_._1.toString) === Seq("2024-01-06", "2024-01-07"))
    // day 6: band over days 1-5 = [900, 1200], close 1250 breaks up
    assert((got(0)._2, got(0)._3, got(0)._4, got(0)._5, got(0)._6, got(0)._7) ===
      ((1250L, 1200L, 900L, 10.50, true, false)))
    // day 7: band over days 2-6 = [900, 1250], close 800 breaks down
    assert((got(1)._2, got(1)._3, got(1)._4, got(1)._5, got(1)._6, got(1)._7) ===
      ((800L, 1250L, 900L, 10.75, false, true)))
  }

  test("williamsR: close at the window low scores -100, at the high 0; " +
    "flat windows unscored") {
    // closes: 1000 1200 900 1100 1050 -> day 5 window [900, 1200], c=1050
    // %R = -100 * (1200-1050)/300 = -50
    val rows = Seq(10.00, 12.00, 9.00, 11.00, 10.50)
      .zipWithIndex.map { case (v, i) => (1L, v, i.toLong + 1, day(i + 1)) }
    val got = Breadth21.williamsR(ticks(rows), "user_id", "ts", "value",
      "event_id", 5)
      .select("day", "win_hi_cents", "win_lo_cents", "williams_r")
      .as[(java.sql.Date, Long, Long, Option[Double])].collect().toSeq
    assert(got === Seq((java.sql.Date.valueOf("2024-01-05"),
      1200L, 900L, Some(-50.0))))
    // flat series: HH = LL -> unscored null
    val flat = Seq.tabulate(5)(i => (2L, 10.00, i.toLong + 1, day(i + 1)))
    val gotFlat = Breadth21.williamsR(ticks(flat), "user_id", "ts", "value",
      "event_id", 5).select("williams_r").as[Option[Double]].collect().toSeq
    assert(gotFlat === Seq(None))
  }

  test("vortex: a monotone up-trending ladder has VI+ = 2, VI- = 0") {
    // day i: two ticks, low (10+i) then close-at-high (11+i); every diff
    // bar contributes tr = 100, |H - prevL| = 200, |L - prevH| = 0
    val rows = (1 to 6).flatMap { i =>
      Seq((1L, 10.0 + i, i * 10L, day(i)),
        (1L, 11.0 + i, i * 10L + 1, f"2024-01-$i%02d 14:00:00"))
    }
    val got = Breadth21.vortex(ticks(rows), "user_id", "ts", "value",
      "event_id", 5)
      .select("day", "sum_tr_cents", "sum_vm_plus_cents",
        "sum_vm_minus_cents", "vi_plus", "vi_minus")
      .as[(java.sql.Date, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(got === Seq((java.sql.Date.valueOf("2024-01-06"),
      500L, 1000L, 0L, Some(2.0), Some(0.0))))
  }

  test("mfi: typical-price-signed flows; unchanged days count to neither " +
    "side but stay in the window") {
    // closes 10.00 11.00 12.00 11.50 11.20 11.80 + a 7th flat day;
    // qty = day index
    val vals = Seq(10.00, 11.00, 12.00, 11.50, 11.20, 11.80, 11.80)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (1L, v, i.toLong + 1, day(i + 1)) }
    val props = (1 to 7).map(i => i.toLong -> s"""{"k": $i}""").toMap
    val got = Breadth21.mfi(ticks(rows, props), "user_id", "ts", "value",
      "event_id", "k", 5)
      .orderBy("day").select("day", "pos_flow", "neg_flow", "mfi")
      .as[(java.sql.Date, Long, Long, Option[Double])].collect().toSeq
    // day 6 window = diffs of days 2..6:
    //   pos = 3300*2 + 3600*3 + 3540*6 = 38640 ; neg = 3450*4 + 3360*5 = 30600
    // day 7 window = diffs of days 3..7 (day 7 unchanged -> neither):
    //   pos = 3600*3 + 3540*6 = 32040 ; neg = 30600
    assert(got.map(_._1.toString) === Seq("2024-01-06", "2024-01-07"))
    assert((got(0)._2, got(0)._3) === ((38640L, 30600L)))
    assert(math.abs(got(0)._4.get - 100.0 * 38640.0 / 69240.0) < 1e-12)
    assert((got(1)._2, got(1)._3) === ((32040L, 30600L)))
    assert(math.abs(got(1)._4.get - 100.0 * 32040.0 / 62640.0) < 1e-12)
  }

  test("cci: integer-rescaled mean deviation matches the hand computation; " +
    "all-equal windows unscored") {
    // cents 10 13 11 20 15 -> tp3 30 39 33 60 45, S = 207
    // num = 5*(5*45 - 207) = 90 ; dev = 57+12+42+93+18 = 222
    val rows = Seq(0.10, 0.13, 0.11, 0.20, 0.15)
      .zipWithIndex.map { case (v, i) => (1L, v, i.toLong + 1, day(i + 1)) }
    val got = Breadth21.cci(ticks(rows), "user_id", "ts", "value",
      "event_id", 5)
      .select("day", "tp3_cents", "dev_sum", "cci")
      .as[(java.sql.Date, Long, Long, Option[Double])].collect().toSeq
    assert(got.map(t => (t._2, t._3)) === Seq((45L, 222L)))
    assert(got.head._4.get === 90.0 / (0.015 * 222.0))
    // all-equal closes: deviation 0 -> unscored
    val flat = Seq.tabulate(5)(i => (2L, 0.10, i.toLong + 1, day(i + 1)))
    val gotFlat = Breadth21.cci(ticks(flat), "user_id", "ts", "value",
      "event_id", 5).select("cci").as[Option[Double]].collect().toSeq
    assert(gotFlat === Seq(None))
  }
}
