package graft

import graft.queries.Breadth100
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the hundred-first wave (Breadth100 product
  * analytics). */
class Wave103Spec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String, String)]) =
    rows.toDF("user_id", "event_id", "at", "event_type")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("featureAdoption counts first-use days and the running total") {
    val e = ev(Seq(
      (1L, 0L, "2024-01-01 10:00:00", "click"),
      (1L, 1L, "2024-01-02 10:00:00", "click"),  // not a new adoption
      (2L, 2L, "2024-01-02 10:00:00", "click")))
    val got = Breadth100.featureAdoption(e, "user_id", "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === Seq(("click", 1L, 1L), ("click", 1L, 2L)))
  }

  test("daynRetention compares last-minus-first against each horizon") {
    val e = ev(Seq(
      (1L, 0L, "2024-01-01 10:00:00", "x"),
      (1L, 1L, "2024-01-09 10:00:00", "x"),   // span 8 → retained @1,7
      (2L, 2L, "2024-01-01 10:00:00", "x")))  // span 0 → never
    val got = Breadth100.daynRetention(e, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got === Seq((1L, 2L, 1L), (7L, 2L, 1L), (14L, 2L, 0L),
      (28L, 2L, 0L)))
  }

  test("sessionQuantiles: rank-exact p50/p90 over gap sessions") {
    // user 1: two sessions (gap > 30 min splits): durations 60 s, 0 s
    // user 2: one session: 600 s → durations {0, 60, 600}
    // p50: k = ceil(3/2) = 2 → 60 s; p90: k = ceil(27/10) = 3 → 600 s
    val e = ev(Seq(
      (1L, 0L, "2024-01-01 10:00:00", "x"),
      (1L, 1L, "2024-01-01 10:01:00", "x"),
      (1L, 2L, "2024-01-01 12:00:00", "x"),
      (2L, 3L, "2024-01-01 10:00:00", "x"),
      (2L, 4L, "2024-01-01 10:10:00", "x")))
    val r = Breadth100.sessionQuantiles(e, "user_id", "ts", "event_id")
      .collect()(0)
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) === 60.0)
    assert(r.getDouble(2) === 600.0)
  }

  test("repeatInterval: day gaps between purchase days only") {
    val e = ev(Seq(
      (1L, 0L, "2024-01-01 10:00:00", "purchase"),
      (1L, 1L, "2024-01-01 12:00:00", "purchase"),  // same day — one day
      (1L, 2L, "2024-01-03 10:00:00", "purchase"),  // gap 2
      (1L, 3L, "2024-01-04 10:00:00", "click"),     // ignored
      (1L, 4L, "2024-01-10 10:00:00", "purchase"))) // gap 7
    val r = Breadth100.repeatInterval(e, "user_id", "ts", "event_type",
      "purchase").collect()(0)
    assert(r.getLong(0) === 2L)
    assert(r.getDouble(1) === 4.5)
    assert(r.getDouble(2) === 2.0)  // k50 = ceil(2/2) = 1 → first gap
    assert(r.getDouble(3) === 7.0)  // k90 = ceil(18/10) = 2
  }
}
