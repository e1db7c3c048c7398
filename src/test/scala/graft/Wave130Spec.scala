package graft

import graft.queries.Breadth124
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-twenty-fifth wave (Breadth124 bitemporal
  * point query). */
class Wave130Spec extends SparkSpec {
  import spark.implicits._

  test("bitemporal: a late-arriving fact is invisible at an early tx " +
    "cut and becomes the answer once known") {
    // valid range: Jan 1 .. Jan 9 (dcut quarter points Jan 3/5/7);
    // tx range: Jan 1 .. Jan 13 (event ts + k-second lag).
    // v1: valid Jan 1, known immediately (k=0)
    // v2: valid Jan 5, known LATE — k pushes its tx past every mid cut
    // v3: valid Jan 9, known immediately — pins the tx range end
    val e = Seq(
      (1L, 1L, "2024-01-01 10:00:00", 1.00, 0L),
      (1L, 2L, "2024-01-05 10:00:00", 2.00, 8L * 86400L),
      (1L, 3L, "2024-01-09 10:00:00", 3.00, 0L))
      .toDF("user_id", "event_id", "at", "value", "k")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", concat(lit("{\"k\":"), col("k"), lit("}")))
      .drop("k")
    val got = Breadth124.bitemporal(e, "user_id", "ts", "value",
      "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(4), r.getDouble(5))).toMap
    // tx quarter cuts: t0 + j·3days; valid cuts: d0 + k·2days
    // j=1 (tx ≈ Jan 4): only v1 known → every valid cut answers v1
    assert(got((1L, 1L)) === ((1L, 1.00)))
    assert(got((1L, 3L)) === ((1L, 1.00)))
    // j=3 (tx ≈ Jan 10): v3 known (tx Jan 9), v2 still in flight
    // (tx Jan 13) → valid ≤ Jan 7 answers v1, valid ≤ Jan 9... dcut
    // k=3 is d0+6d = Jan 7 < Jan 9, so v3 is out of VALID range and
    // the late v2 is out of TX range — still v1
    assert(got((3L, 3L)) === ((1L, 1.00)))
    // full grid rows: 9 probes × 1 user, each with an answer (v1 is
    // always known and always valid)
    assert(got.size === 9)
  }

  test("bitemporal tie-break: same valid day picks the later tx, then " +
    "the later event_id") {
    val e = Seq(
      (1L, 1L, "2024-01-01 10:00:00", 1.00, 0L),   // corrected below
      (1L, 2L, "2024-01-01 11:00:00", 1.50, 0L),   // later tx, same day
      (2L, 3L, "2024-01-09 10:00:00", 9.00, 0L))   // stretches ranges
      .toDF("user_id", "event_id", "at", "value", "k")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", concat(lit("{\"k\":"), col("k"), lit("}")))
      .drop("k")
    val got = Breadth124.bitemporal(e, "user_id", "ts", "value",
      "event_id").collect()
      .filter(r => r.getLong(2) == 1L)
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    // user 1's day-1 value is always the CORRECTED 1.50 at any probe
    // that includes tx ≥ 11:00 — the top-right probe certainly does
    assert(got((3L, 3L)) === 1.50)
  }
}
