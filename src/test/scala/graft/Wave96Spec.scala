package graft

import graft.queries.Breadth93
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the ninety-fourth wave (Breadth93 user
  * paths / step transitions / time-to-convert). */
class Wave96Spec extends SparkSpec {
  import spark.implicits._

  private def events(rows: Seq[(Long, Long, String, String)]) =
    rows.toDF("user_id", "event_id", "at", "event_type")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("userPaths: first-3 paths count across users, short histories " +
    "keep their short path") {
    val e = events(Seq(
      (1L, 0L, "2024-01-01 10:00:00", "A"),
      (1L, 1L, "2024-01-01 10:01:00", "B"),
      (1L, 2L, "2024-01-01 10:02:00", "C"),
      (1L, 3L, "2024-01-01 10:03:00", "D"), // beyond first 3
      (2L, 0L, "2024-01-01 10:00:00", "A"),
      (2L, 1L, "2024-01-01 10:01:00", "B"),
      (2L, 2L, "2024-01-01 10:02:00", "C"),
      (3L, 0L, "2024-01-01 10:00:00", "X")))
    val got = Breadth93.userPaths(e, "user_id", "ts", "event_id",
        "event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("A>B>C", 2L), ("X", 1L)))
  }

  test("stepTransitions: pairs keep their journey position") {
    val e = events(Seq(
      (1L, 0L, "2024-01-01 10:00:00", "A"),
      (1L, 1L, "2024-01-01 10:01:00", "B"),
      (1L, 2L, "2024-01-01 10:02:00", "C"),
      (2L, 0L, "2024-01-01 10:00:00", "A"),
      (2L, 1L, "2024-01-01 10:01:00", "B")))
    val got = Breadth93.stepTransitions(e, "user_id", "ts", "event_id",
        "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got === Seq((1L, "A", "B", 2L), (2L, "B", "C", 1L)))
  }

  test("timeToConvert: only purchases strictly after the first signup " +
    "convert; median and p90 are rank-exact") {
    val e = events(Seq(
      (1L, 0L, "2024-01-01 10:00:00", "signup"),
      (1L, 1L, "2024-01-01 10:00:30", "purchase"), // 30 s
      (2L, 0L, "2024-01-01 09:00:00", "purchase"), // pre-signup: ignored
      (2L, 1L, "2024-01-01 10:00:00", "signup"),
      (2L, 2L, "2024-01-01 10:02:00", "purchase"), // 120 s
      (3L, 0L, "2024-01-01 10:00:00", "purchase"))) // never signed up
    val r = Breadth93.timeToConvert(e, "user_id", "ts", "event_id",
        "event_type", "signup", "purchase").collect()(0)
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === 30L)  // rn (2+1) div 2 = 1
    assert(r.getLong(2) === 120L) // rn (18+9) div 10 = 2
  }
}
