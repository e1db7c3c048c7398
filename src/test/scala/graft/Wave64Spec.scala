package graft

import graft.queries.Breadth62
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the sixty-third wave (Breadth62 survival /
  * attribution / exact moments). */
class Wave64Spec extends SparkSpec {
  import spark.implicits._

  private def ordersOf(rows: Seq[(Long, String)]) =
    rows.toDF("o_custkey", "at")
      .withColumn("o_orderdate", to_timestamp_ntz(col("at"))).drop("at")

  test("survivalKm: hand KM with one censored customer") {
    // A churns at lt=10, B at lt=20, C (last order at the corpus max)
    // is censored at lt=365, D churns at lt=10.
    val orders = ordersOf(Seq(
      1L -> "2024-01-01 00:00:00", 1L -> "2024-01-11 00:00:00",
      2L -> "2024-01-01 00:00:00", 2L -> "2024-01-21 00:00:00",
      3L -> "2024-01-01 00:00:00", 3L -> "2024-12-31 00:00:00",
      4L -> "2024-02-01 00:00:00", 4L -> "2024-02-11 00:00:00"))
    val got = Breadth62.survivalKm(orders, censorDays = 180)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // t=10: n=4 at risk, d=2 → S=0.5; t=20: n=2, d=1 → S=0.25;
    // C's censor time (365) emits no row.
    assert(got === Seq((10, 4L, 2L, 0.5), (20, 2L, 1L, 0.25)))
  }

  test("survivalKm: risk set emptying at a churn time lands survival " +
    "exactly 0 (the log(0) guard)") {
    // C's lone order sets the max date; A and B churn together at t=10
    // with nobody left after them.
    val orders = ordersOf(Seq(
      1L -> "2024-01-01 00:00:00", 1L -> "2024-01-11 00:00:00",
      2L -> "2024-01-01 00:00:00", 2L -> "2024-01-11 00:00:00",
      3L -> "2024-12-31 00:00:00"))
    val got = Breadth62.survivalKm(orders, censorDays = 180)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // t=0 (C, censored) emits no row; t=10: n=2, d=2 → S=0.0 exactly.
    assert(got === Seq((10, 2L, 2L, 0.0)))
  }

  test("attribution: first/last touch by hand, direct when the " +
    "conversion opens the history") {
    val rows = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (1L, 4L, "error"), // after the conversion — no credit
      (2L, 5L, "purchase"), // first event is the conversion → direct
      (3L, 6L, "click"), (3L, 7L, "purchase"), (3L, 8L, "purchase"))
    val events = rows.map { case (u, i, t) =>
      (u, i, t, f"2024-01-01 00:00:${i}%02d")
    }.toDF("user_id", "event_id", "event_type", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth62.attribution(events, "user_id", "ts", "event_id",
        "event_type", "purchase")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got === Seq(("click", 1L, 2L), ("direct", 1L, 1L),
      ("view", 1L, 0L)))
  }

  test("moments: exact-integer skew/kurt match Spark's built-in " +
    "population skewness/kurtosis on whole-cent data") {
    val vals = Seq(1.00, 2.00, 2.00, 3.00, 7.00, 2.00, 4.00, 1.00)
    val df = vals.map(("a", _)).toDF("g", "value")
    val got = Breadth62.moments(df, "g", "value").collect().head
    val ref = df.agg(skewness(col("value")), kurtosis(col("value")))
      .collect().head
    assert(got.getLong(1) === vals.size.toLong)
    assert(math.abs(got.getDouble(2) - vals.sum / vals.size) < 1e-9)
    assert(math.abs(got.getDouble(3) - ref.getDouble(0)) < 2e-6)
    assert(math.abs(got.getDouble(4) - ref.getDouble(1)) < 2e-6)
  }
}
