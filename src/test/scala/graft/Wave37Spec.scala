package graft

import graft.queries.Breadth37
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the thirty-seventh wave (Breadth37
  * volatility regime + gap stats). */
class Wave37Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long, String)]) =
    rows.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", lit("{}"))

  private def day(i: Int) =
    java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1).toString + " 10:00:00"

  private def series(closes: Seq[Long], key: Long = 1L) =
    closes.zipWithIndex.map { case (c, i) =>
      (key, c.toDouble / 100.0, i.toLong + 1, day(i + 1))
    }

  /** Two ticks per day at distinct times → (open, close) bars. */
  private def ocSeries(bars: Seq[(Long, Long)], key: Long = 1L) =
    bars.zipWithIndex.flatMap { case ((o, c), i) =>
      Seq((key, o.toDouble / 100.0, i.toLong * 2 + 1, day(i + 1)),
        (key, c.toDouble / 100.0, i.toLong * 2 + 2, day(i + 1)))
    }

  test("volRatio: a constant-TR series pins both ATRs at the TR and " +
    "the ratio at exactly 1; the hand fold pins a varying series") {
    // constant 100-cent gaps: TR = 100 every bar
    val flat = (0 until 25).map(i => 1000L + i * 100)
    val gotF = Breadth37.volRatio(ticks(series(flat)),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("atr_short", "atr_long", "vol_ratio")
      .as[(Double, Double, Double)].collect().toSeq
    assert(gotF.size === 25 - 20) // scored once ATR(20) seeds
    assert(gotF.forall(t => t._1 === 1.0 && t._2 === 1.0 && t._3 === 1.0))
    // varying series: hand fold
    val closes = (0 until 26).map(i => 1000L + (i % 7) * 31 + i * 5)
    val got = Breadth37.volRatio(ticks(series(closes, key = 2L)),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("vol_ratio").as[Double].collect().toSeq
    var st: Option[Breadth37.VrAcc] = None
    val want = closes.zipWithIndex.flatMap { case (c, i) =>
      val a = Breadth37.vrStep(st, c, c, c, i)
      st = Some(a)
      (a.atrS, a.atrL) match {
        case (Some(s), Some(l)) if l > 0.0 => Some(s / l)
        case _ => None
      }
    }
    assert(got === want)
  }

  test("gapStats: known open/close bars pin every column") {
    // bars: (open, close): gaps vs prior close: +20, -30, 0
    val bars = Seq((1000L, 1100L), (1120L, 1050L), (1020L, 1080L),
      (1080L, 1090L))
    val got = Breadth37.gapStats(ticks(ocSeries(bars)),
      "user_id", "ts", "value", "event_id")
      .select("n_days", "n_gap_up", "n_gap_down", "max_gap_up_cents",
        "max_gap_down_cents", "sum_abs_gap_cents", "gap_density")
      .as[(Long, Long, Long, Long, Long, Long, Option[Double])]
      .collect().toSeq
    // prior closes: 1100, 1050, 1080 → Σpc = 3230; |gaps| 20+30+0 = 50
    assert(got === Seq((3L, 1L, 1L, 20L, -30L, 50L,
      Some(50.0 / 3230.0))))
  }
}
