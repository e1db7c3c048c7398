package graft

import graft.queries.Breadth64
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the sixty-fifth wave (Breadth64
  * elasticity / cohort LTV / A/B lift). */
class Wave66Spec extends SparkSpec {
  import spark.implicits._

  test("elasticity: exact unit-elastic demand (q = 8/u) fits slope -1; " +
    "a single-price part is dropped") {
    // part 1: unit prices 1, 2, 4 with quantities 8, 4, 2 (ext = u*q);
    // part 2: both rows at unit price 2 → zero denominator.
    val rows = Seq((1L, 8.0, 8.0), (1L, 4.0, 8.0), (1L, 2.0, 8.0),
      (2L, 3.0, 6.0), (2L, 5.0, 10.0))
    val li = rows.toDF("l_partkey", "l_quantity", "l_extendedprice")
    val got = Breadth64.elasticity(li)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length === 1)
    assert(got.head._1 === 1L && got.head._2 === 3L)
    assert(math.abs(got.head._3 - (-1.0)) < 1e-4)
  }

  test("cohortLtv: two weekly cohorts accumulate revenue by hand") {
    // u1 cohorts in the Monday 2024-01-01 week (purchases 1.00 then
    // 2.00 a week later); u2 cohorts a week after with one 4.00.
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", "view", 0.0),
      (1L, "2024-01-03 10:00:00", "purchase", 1.0),
      (1L, "2024-01-10 10:00:00", "purchase", 2.0),
      (2L, "2024-01-08 09:00:00", "purchase", 4.0))
    val events = rows.toDF("user_id", "at", "event_type", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth64.cohortLtv(events, "user_id", "ts", "event_type",
        "value", "purchase")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got === Seq(
      ("2024-01-01", 0, 1L, 100L, 1.0),
      ("2024-01-01", 1, 1L, 300L, 3.0),
      ("2024-01-08", 0, 1L, 400L, 4.0)))
  }

  test("abLift: hand two-arm rates, lift and pooled z") {
    // arm A (even users): u0 converts (250 > 200), u2 does not;
    // arm B (odd): u1 and u3 both convert.
    val rows = Seq((0L, "purchase", 250.0), (2L, "purchase", 100.0),
      (1L, "purchase", 300.0), (3L, "purchase", 201.0),
      (0L, "click", 500.0)) // non-purchase value never converts
    val events = rows.toDF("user_id", "event_type", "value")
    val r = Breadth64.abLift(events, "user_id", "event_type", "purchase",
      200.0).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 1L, 2L, 2L)))
    assert(r.getDouble(4) === 0.5 && r.getDouble(5) === 1.0)
    assert(r.getDouble(6) === 1.0)
    val z = (1.0 - 0.5) / math.sqrt(0.75 * 0.25 * (0.5 + 0.5))
    assert(math.abs(r.getDouble(7) - z) < 1e-12)
  }

  test("abLift: saturated arms pin z (and a zero A-arm pins lift) to " +
    "NULL instead of NaN") {
    val all = Seq((0L, "purchase", 300.0), (1L, "purchase", 300.0))
      .toDF("user_id", "event_type", "value")
    val r1 = Breadth64.abLift(all, "user_id", "event_type", "purchase",
      200.0).collect().head
    assert(r1.isNullAt(7))
    val none = Seq((0L, "purchase", 10.0), (1L, "purchase", 20.0))
      .toDF("user_id", "event_type", "value")
    val r2 = Breadth64.abLift(none, "user_id", "event_type", "purchase",
      200.0).collect().head
    assert(r2.isNullAt(6) && r2.isNullAt(7))
  }
}
