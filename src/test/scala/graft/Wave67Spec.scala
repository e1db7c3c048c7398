package graft

import graft.queries.Breadth65
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the sixty-sixth wave (Breadth65 McClellan
  * oscillator and χ² independence). */
class Wave67Spec extends SparkSpec {
  import spark.implicits._

  test("mcclellan: hand net advances and the two EMA seeds") {
    // u1 closes 100,200,150 → +1 then −1; u2 closes 100,300,400 →
    // +1,+1. Net advances: day2 = 2, day3 = 0.
    val rows = Seq(
      (1L, 1L, "2024-01-01", 1.00), (1L, 2L, "2024-01-02", 2.00),
      (1L, 3L, "2024-01-03", 1.50),
      (2L, 4L, "2024-01-01", 1.00), (2L, 5L, "2024-01-02", 3.00),
      (2L, 6L, "2024-01-03", 4.00))
    val events = rows.map { case (u, i, d, v) => (u, i, s"$d 10:00:00", v) }
      .toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth65.mcclellan(events, "user_id", "ts", "value",
        "event_id")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSeq
    val e19 = Breadth65.McA19 * 0.0 + (1.0 - Breadth65.McA19) * 2.0
    val e39 = Breadth65.McA39 * 0.0 + (1.0 - Breadth65.McA39) * 2.0
    assert(got === Seq(
      ("2024-01-02", 2L, 2.0, 2.0, 0.0),
      ("2024-01-03", 0L, e19, e39, e19 - e39)))
  }

  test("chi2: a hand 2x2 table with all expected counts 15") {
    // A: 10 on dow0, 20 on dow1; B: 20 and 10 → every |o−e| = 5,
    // χ² = 4·25/15 = 6.666667 at dof 1.
    val rows =
      Seq.fill(10)(("A", "2024-01-01")) ++ Seq.fill(20)(("A", "2024-01-02")) ++
      Seq.fill(20)(("B", "2024-01-01")) ++ Seq.fill(10)(("B", "2024-01-02"))
    val events = rows.map { case (t, d) => (t, s"$d 10:00:00") }
      .toDF("event_type", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val r = Breadth65.chi2(events, "event_type", "ts", "2024-01-01")
      .collect().head
    assert(r.getLong(0) === 60L)
    assert(r.getLong(1) === 1L)
    assert(r.getDouble(2) === 6.666667)
  }
}
