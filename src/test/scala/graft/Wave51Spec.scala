package graft

import graft.queries.Breadth51
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the fifty-second wave (Breadth51 SAX). */
class Wave51Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Long, Int)]) =
    rows.zipWithIndex.map { case ((k, c, d), i) =>
      (k, c.toDouble / 100.0, i.toLong + 1, f"2024-01-$d%02d 10:00:00")
    }.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", lit("{}"))

  test("saxSegments: a low plateau then a high plateau symbolize a…c " +
    "with the hand PAA means; a short tail segment keeps its bar count") {
    // 9 bars: 4×100, 4×200, 1×300 → segments (1.0,'a'), (2.0,'b'), (3.0,'c')
    val closes = Seq.fill(4)(100L) ++ Seq.fill(4)(200L) ++ Seq(300L)
    val rows = closes.zipWithIndex.map { case (c, i) => (1L, c, i + 1) }
    val got = Breadth51.saxSegments(ticks(rows),
        "user_id", "ts", "value", "event_id")
      .orderBy("seg_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4))).toSeq
    // ranks 1,2,3 of ns=3 → buckets (4·0)div3=0, (4·1)div3=1, (4·2)div3=2
    assert(got === Seq((0L, 4L, 1.0, "a"), (1L, 4L, 2.0, "b"),
      (2L, 1L, 3.0, "c")))
  }

  test("saxWords: two keys with the same coarse shape at different " +
    "levels share a word; a reversed shape does not") {
    val k1 = Seq.fill(4)(100L) ++ Seq.fill(4)(200L) // "ac" shape
    val k2 = Seq.fill(4)(5000L) ++ Seq.fill(4)(9000L) // same shape, high
    val k3 = Seq.fill(4)(200L) ++ Seq.fill(4)(100L) // reversed
    val rows =
      k1.zipWithIndex.map { case (c, i) => (1L, c, i + 1) } ++
        k2.zipWithIndex.map { case (c, i) => (2L, c, i + 1) } ++
        k3.zipWithIndex.map { case (c, i) => (3L, c, i + 1) }
    val got = Breadth51.saxWords(ticks(rows),
        "user_id", "ts", "value", "event_id")
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got === Seq((1L, "ac", 2L), (2L, "ac", 2L), (3L, "ca", 1L)))
  }
}
