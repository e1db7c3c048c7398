package graft

import graft.queries.Breadth89
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the ninetieth wave (Breadth89 stickiness /
  * L28 histogram / new-vs-returning). */
class Wave92Spec extends SparkSpec {
  import spark.implicits._

  // u1 active days 1,2,5; u2 active days 2,4 (one dup event on day 2)
  private val fixture = Seq(
    (1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 10:00:00"),
    (1L, "2024-01-05 10:00:00"),
    (2L, "2024-01-02 10:00:00"), (2L, "2024-01-02 15:00:00"),
    (2L, "2024-01-04 10:00:00"))
    .toDF("user_id", "at")
    .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("stickiness: the merged-interval sweep equals the rolling " +
    "3-day distinct count at every active day") {
    val got = Breadth89.stickiness(fixture, "user_id", "ts", win = 3)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getDouble(3))).toSeq
    assert(got === Seq(
      ("2024-01-01", 1L, 1L, 1.0),
      ("2024-01-02", 2L, 2L, 1.0),
      ("2024-01-04", 1L, 2L, 0.5), // u1 active day 2 still in [2,4]
      ("2024-01-05", 1L, 2L, 0.5))) // u2 day 4 still in [3,5]
  }

  test("l28Histogram: trailing-window active-day counts histogram") {
    // last day 5, win 3 -> window days 3..5: u1 1 day, u2 1 day
    val got = Breadth89.l28Histogram(fixture, "user_id", "ts", win = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 2L)))
  }

  test("newReturning: first-ever day counts as new, later days as " +
    "returning, day-deduped") {
    val got = Breadth89.newReturning(fixture, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2))).toSeq
    assert(got === Seq(
      ("2024-01-01", 1L, 0L),
      ("2024-01-02", 1L, 1L),
      ("2024-01-04", 0L, 1L),
      ("2024-01-05", 0L, 1L)))
  }
}
