package graft

import graft.queries.Breadth120
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-twenty-first wave (Breadth120 window
  * funnel + sequence match). */
class Wave126Spec extends SparkSpec {
  import spark.implicits._

  test("funnelLevelUdf: strict ordering, window deadline, greedy " +
    "earliest-step search") {
    val W = Breadth120.FunnelWindowUs
    val df = Seq(
      // (views, clicks, purchases, want)
      (Seq.empty[Long], Seq(1L), Seq(2L), 0),          // no view
      (Seq(5L), Seq(1L), Seq(9L), 1),                  // click BEFORE view
      (Seq(0L), Seq(1L), Seq.empty[Long], 2),          // no purchase
      (Seq(0L), Seq(1L), Seq(W + 1L), 2),              // purchase past deadline
      (Seq(0L), Seq(1L, 10L), Seq(5L), 3),             // greedy earliest click
      (Seq(0L, W), Seq(W + 1L), Seq(W + 2L), 3),       // later view anchors
      (Seq(0L), Seq(0L), Seq(1L), 1))                  // tie is NOT strictly after
      .toDF("v", "c", "p", "want")
    val got = df.select(
      Breadth120.funnelLevelUdf(col("v"), col("c"), col("p")).as("lvl"),
      col("want")).collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("windowFunnel histogram covers all four levels") {
    val rows = Seq(
      (1L, "error", 0L),                               // level 0
      (2L, "view", 0L),                                // level 1
      (3L, "view", 0L), (3L, "click", 1000L),          // level 2
      (4L, "view", 0L), (4L, "click", 1000L), (4L, "purchase", 2000L))
    val e = rows.map { case (u, t, us) =>
      (u, t, java.time.LocalDateTime.ofEpochSecond(
        1700000000L + us / 1000000L, ((us % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)) }
      .toDF("user_id", "event_type", "ts")
    val got = Breadth120.windowFunnel(e, "user_id", "event_type", "ts")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === Map(0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 1L))
  }

  test("sequenceMatch: error between signup and purchase breaks the " +
    "match; ties order by the tiebreak column") {
    val base = java.time.LocalDateTime.of(2024, 1, 1, 10, 0)
    val rows = Seq(
      (1L, 1L, "signup"), (1L, 2L, "view"), (1L, 3L, "purchase"),
      (2L, 1L, "signup"), (2L, 2L, "error"), (2L, 3L, "purchase"),
      (3L, 1L, "purchase"), (3L, 2L, "signup"))
    // same ts everywhere → ordering falls entirely on event_id
    val e = rows.map { case (u, i, t) => (u, i, t, base) }
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Breadth120.sequenceMatch(e, "user_id", "event_type", "ts",
      "event_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(1L) === (3L, true))   // s v p
    assert(got(2L) === (3L, false))  // s e p — error breaks it
    assert(got(3L) === (2L, false))  // p s — wrong order
  }
}
