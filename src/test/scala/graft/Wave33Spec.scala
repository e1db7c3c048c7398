package graft

import graft.queries.Breadth33
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the thirty-third wave (Breadth33
  * integer-ratio oscillators + the streak recurrence). */
class Wave33Spec extends SparkSpec {
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

  /** Three ticks per day → (open, low/high spread, close). */
  private def ohlcSeries(bars: Seq[(Long, Long, Long, Long)], key: Long = 1L) =
    bars.zipWithIndex.flatMap { case ((o, h, l, c), i) =>
      Seq((key, o.toDouble / 100.0, i.toLong * 4 + 1, day(i + 1)),
        (key, h.toDouble / 100.0, i.toLong * 4 + 2, day(i + 1)),
        (key, l.toDouble / 100.0, i.toLong * 4 + 3, day(i + 1)),
        (key, c.toDouble / 100.0, i.toLong * 4 + 4, day(i + 1)))
    }

  test("rvi: constant bullish bars (close−open = half the range) pin " +
    "rvi = 0.5 and signal = 0.5 once the lags fill") {
    // every day: open 1000, high 1040, low 1000, close 1020
    val bars = Seq.fill(15)((1000L, 1040L, 1000L, 1020L))
    val got = Breadth33.rvi(ticks(ohlcSeries(bars)),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("rvi", "rvi_signal")
      .as[(Option[Double], Option[Double])].collect().toSeq
    assert(got.size === 6) // 15 bars − 9 window warm-up
    assert(got.forall(_._1.contains(0.5)))
    assert(got.take(3).forall(_._2.isEmpty)) // lag fill
    assert(got.drop(3).forall(_._2.contains(0.5)))
  }

  test("ultimateOsc: bars that gap up with close at the high pin every " +
    "horizon ratio at 1 -> UO = 100") {
    // bar i: low = high = close = 1000 + 100i; BP = TR = gap
    val bars = (0 until 20).map(i => 1000L + i * 100)
    val got = Breadth33.ultimateOsc(ticks(series(bars)),
      "user_id", "ts", "value", "event_id")
      .select("uo").as[Option[Double]].collect().toSeq
    assert(got.nonEmpty && got.forall(_.contains(100.0)))
  }

  test("vhf: a monotone path pins vhf = 13/14 (the 14-diff window's " +
    "close range spans 13 steps); a perfect zig-zag pins range/path " +
    "exactly") {
    val rise = (0 until 20).map(i => 1000L + i * 10)
    val gotR = Breadth33.vhf(ticks(series(rise)),
      "user_id", "ts", "value", "event_id")
      .select("vhf").as[Option[Double]].collect().toSeq
    assert(gotR.nonEmpty && gotR.forall(_.contains(13.0 / 14.0)))
    // zig-zag ±10: 14-diff path length = 140, close range = 10
    val zig = (0 until 20).map(i => if (i % 2 == 0) 1000L else 1010L)
    val gotZ = Breadth33.vhf(ticks(series(zig, key = 2L)),
      "user_id", "ts", "value", "event_id")
      .select("vhf").as[Option[Double]].collect().toSeq
    assert(gotZ.nonEmpty && gotZ.forall(_.contains(10.0 / 140.0)))
  }

  test("streak: runs extend, reversals restart at ±1, a flat close " +
    "resets to 0; the hand fold pins the whole series") {
    val closes = Seq(1000L, 1010L, 1020L, 1020L, 1010L, 1000L, 1010L)
    val got = Breadth33.streak(ticks(series(closes)),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("streak").as[Long].collect().toSeq
    assert(got === Seq(0L, 1L, 2L, 0L, -1L, -2L, 1L))
  }
}
