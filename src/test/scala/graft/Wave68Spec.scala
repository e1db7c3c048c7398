package graft

import graft.queries.Breadth66
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the sixty-seventh wave (Breadth66 entropy
  * rate and PSI drift). */
class Wave68Spec extends SparkSpec {
  import spark.implicits._

  private def eventsOf(rows: Seq[(Long, Long, String, String)]) =
    rows.toDF("user_id", "event_id", "event_type", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("entropyRate: a perfectly alternating sequence is fully " +
    "predictable (0 bits)") {
    val rows = Seq("A", "B", "A", "B", "A").zipWithIndex.map {
      case (t, i) => (1L, i.toLong, t, f"2024-01-01 00:00:${i}%02d")
    }
    val r = Breadth66.entropyRate(eventsOf(rows), "user_id", "ts",
      "event_id", "event_type").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) === ((4L, 2L, 0.0)))
  }

  test("entropyRate: a fair binary branch from one state is 1 bit") {
    // u1: A→B, u2: A→C — P(B|A) = P(C|A) = 1/2.
    val rows = Seq((1L, 0L, "A", "2024-01-01 00:00:00"),
      (1L, 1L, "B", "2024-01-01 00:00:01"),
      (2L, 2L, "A", "2024-01-01 00:00:00"),
      (2L, 3L, "C", "2024-01-01 00:00:01"))
    val r = Breadth66.entropyRate(eventsOf(rows), "user_id", "ts",
      "event_id", "event_type").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) === ((2L, 1L, 1.0)))
  }

  test("psi: hand two-bin drift, and a bin seen on only one side " +
    "contributes 0 while still counting in the denominator") {
    // baseline: 10 @ bin0, 10 @ bin1; current: 5 @ bin0, 15 @ bin1,
    // 2 @ bin2 (current-only bin).
    val rows =
      (0 until 10).map(i => (1L, i.toLong, "a", "2024-01-10 00:00:00", 10.0)) ++
      (0 until 10).map(i => (1L, 100L + i, "a", "2024-01-10 00:00:00", 60.0)) ++
      (0 until 5).map(i => (1L, 200L + i, "a", "2024-01-20 00:00:00", 10.0)) ++
      (0 until 15).map(i => (1L, 300L + i, "a", "2024-01-20 00:00:00", 60.0)) ++
      (0 until 2).map(i => (1L, 400L + i, "a", "2024-01-20 00:00:00", 110.0))
    val events = rows.toDF("user_id", "event_id", "event_type", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val r = Breadth66.psi(events, "event_type", "ts", "value",
      "2024-01-16").collect().head
    assert(r.getString(0) === "a")
    assert((r.getLong(1), r.getLong(2)) === ((20L, 22L)))
    val q0 = 5.0 / 22.0; val q1 = 15.0 / 22.0
    val expected = (0.5 - q0) * math.log(0.5 / q0) +
      (0.5 - q1) * math.log(0.5 / q1)
    assert(math.abs(r.getDouble(3) - expected) < 1e-6)
  }
}
