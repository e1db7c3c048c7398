package graft

import graft.queries.Breadth24
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the twenty-fourth wave (Breadth24 —
  * Ichimoku, Aroon, Heikin-Ashi, Ulcer index). */
class Wave24Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long, String)]) =
    rows.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", lit("{}"))

  private def day(i: Int) = f"2024-01-$i%02d 10:00:00"

  private def series(vals: Seq[Double], key: Long = 1L) =
    vals.zipWithIndex.map { case (v, i) => (key, v, i.toLong + 1, day(i + 1)) }

  test("ichimoku: on a monotone single-tick series every component is the " +
    "closed-form window midline, with the documented null warm-ups") {
    val cents = (0 until 13).map(i => 1000L + 100L * i)
    val rows = Breadth24.ichimoku(
      ticks(series(cents.map(_.toDouble / 100.0))),
      "user_id", "ts", "value", "event_id")
      .orderBy("day")
      .select("tenkan", "kijun", "senkou_a", "senkou_b", "chikou_cents")
      .collect()
    assert(rows.length === 13)
    def t2(j: Int) = cents(j) + cents(j - 2)
    def k2(j: Int) = cents(j) + cents(j - 4)
    rows.zipWithIndex.foreach { case (r, i) =>
      // tenkan: (HH3+LL3)/200 — on a rising series HH=c_i, LL=c_{i-2}
      if (i < 2) assert(r.isNullAt(0), s"row $i tenkan")
      else assert(r.getDouble(0) === t2(i) / 200.0, s"row $i tenkan")
      if (i < 4) assert(r.isNullAt(1), s"row $i kijun")
      else assert(r.getDouble(1) === k2(i) / 200.0, s"row $i kijun")
      // senkou A: the (tenkan2+kijun2)/4 midline displaced 3 bars
      if (i < 7) assert(r.isNullAt(2), s"row $i senkou_a")
      else assert(r.getDouble(2) === (t2(i - 3) + k2(i - 3)) / 400.0,
        s"row $i senkou_a")
      // senkou B: the 10-bar midline displaced 3 — first lands on row 12
      if (i < 12) assert(r.isNullAt(3), s"row $i senkou_b")
      else assert(r.getDouble(3) === (cents(i - 3) + cents(i - 12)) / 200.0,
        s"row $i senkou_b")
      // chikou: close led 3 bars, null on the last 3 rows
      if (i >= 10) assert(r.isNullAt(4), s"row $i chikou")
      else assert(r.getLong(4) === cents(i + 3), s"row $i chikou")
    }
  }

  test("aroon: rising pins up=100/dn=0, falling the mirror, and a " +
    "constant series scores BOTH 100 (every bar re-touches both extremes)") {
    def run(cents: Seq[Long], key: Long) = Breadth24.aroon(
      ticks(series(cents.map(_.toDouble / 100.0), key)),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("aroon_up", "aroon_dn", "aroon_osc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val rising = run((0 until 8).map(i => 1000L + 100L * i), 1L)
    assert(rising.length === 3) // 8 bars, 6-bar windows
    assert(rising.forall(_ === ((100L, 0L, 100L))))
    val falling = run((0 until 8).map(i => 2000L - 100L * i), 2L)
    assert(falling.forall(_ === ((0L, 100L, -100L))))
    val flat = run(Seq.fill(8)(1500L), 3L)
    assert(flat.forall(_ === ((100L, 100L, 0L))))
  }

  test("heikin-ashi: the hand fold pins every bar of a 4-tick OHLC " +
    "fixture, and a flat series collapses to the constant candle") {
    // per day: open@09, high@10, low@12, close@15 (event ids in order)
    val bars = Seq( // (o, h, l, c) cents
      (1000L, 1060L, 950L, 1040L), (1040L, 1100L, 1000L, 1020L),
      (1020L, 1150L, 1010L, 1140L), (1140L, 1160L, 1050L, 1060L),
      (1060L, 1120L, 1040L, 1100L))
    val rows = bars.zipWithIndex.flatMap { case ((o, h, l, c), i) =>
      Seq((1L, o.toDouble / 100.0, i * 10L + 1, f"2024-01-${i + 1}%02d 09:00:00"),
        (1L, h.toDouble / 100.0, i * 10L + 2, f"2024-01-${i + 1}%02d 10:00:00"),
        (1L, l.toDouble / 100.0, i * 10L + 3, f"2024-01-${i + 1}%02d 12:00:00"),
        (1L, c.toDouble / 100.0, i * 10L + 4, f"2024-01-${i + 1}%02d 15:00:00"))
    }
    val got = Breadth24.heikinAshi(ticks(rows), "user_id", "ts", "value",
        "event_id")
      .orderBy("day").select("ha_open", "ha_high", "ha_low", "ha_close")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    var st: Option[Breadth24.HaAcc] = None
    val want = bars.map { case (o, h, l, c) =>
      val a = Breadth24.haStep(st, o, h, l, c)
      st = Some(a)
      val r = Breadth24.haOut(a, h, l)
      (r.ha_open, r.ha_high, r.ha_low, r.ha_close)
    }
    assert(got === want)
    // flat: every HA bar equals the constant price exactly
    val flat = Breadth24.heikinAshi(
      ticks(series(Seq.fill(4)(12.0), key = 2L)),
      "user_id", "ts", "value", "event_id")
      .select("ha_open", "ha_high", "ha_low", "ha_close")
      .collect()
    assert(flat.forall(r => (0 to 3).forall(j => r.getDouble(j) === 1200.0)))
  }

  test("ulcer: a rising series has zero drawdown; the hand fold pins the " +
    "quantized sum on a drawdown path") {
    val rising = Breadth24.ulcer(
      ticks(series((0 until 7).map(i => 10.0 + i))),
      "user_id", "ts", "value", "event_id")
      .select("sum_dd2_q", "ulcer").collect()
    assert(rising.length === 3) // 7 bars, 5-bar windows
    assert(rising.forall(r => r.getLong(0) === 0L && r.getDouble(1) === 0.0))
    val cents = Seq(1000L, 1200L, 900L, 1100L, 800L, 1300L, 700L)
    val got = Breadth24.ulcer(
      ticks(series(cents.map(_.toDouble / 100.0), key = 2L)),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("sum_dd2_q", "ulcer")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = (4 until cents.length).map { i =>
      val w = cents.slice(i - 4, i + 1)
      var m = 0L; var s = 0L
      w.foreach { c =>
        m = math.max(m, c)
        val dd = (m - c).toDouble
        s += math.floor(1.0e8 * dd * dd / (m.toDouble * m.toDouble)).toLong
      }
      (s, math.sqrt(s.toDouble / 5.0e8 * 1.0e4))
    }
    assert(got === want)
    assert(got.last._1 > 0L)
  }
}
