package graft

import graft.queries.Breadth60
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the sixty-first wave (Breadth60 RFM
  * segmentation). */
class Wave62Spec extends SparkSpec {
  import spark.implicits._

  private def orders(rows: (Long, Long, Double, String)*) =
    rows.map { case (ok, ck, p, d) => (ok, ck, "O", p, d + " 00:00:00", "1") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "at", "o_orderpriority")
      .withColumn("o_orderdate", to_timestamp_ntz(col("at"))).drop("at")

  test("rfm: five customers split into clean quintiles on every axis") {
    // customer k: k orders, each 100·k, last order day k (later = bigger k)
    val rows = (1L to 5L).flatMap(k =>
      (1L to k).map(i => (k * 10 + i, k, k * 100.0, f"2024-01-${k}%02d")))
    val got = Breadth60.rfm(orders(rows: _*))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getString(7))).toSeq
    // recency: cust 5 most recent (0 days) → r 5 … cust 1 → r 1;
    // frequency/monetary rank the same way
    assert(got === Seq(
      (1L, 4, 1L, 100.0, "111"), (2L, 3, 2L, 400.0, "222"),
      (3L, 2, 3L, 900.0, "333"), (4L, 1, 4L, 1600.0, "444"),
      (5L, 0, 5L, 2500.0, "555")))
  }

  test("rfmSummary: segments roll up with the exact monetary ratio") {
    val rows = (1L to 5L).flatMap(k =>
      (1L to k).map(i => (k * 10 + i, k, k * 100.0, f"2024-01-${k}%02d")))
    val got = Breadth60.rfmSummary(orders(rows: _*))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === Seq(
      ("111", 1L, 10000L, 100.0), ("222", 1L, 40000L, 400.0),
      ("333", 1L, 90000L, 900.0), ("444", 1L, 160000L, 1600.0),
      ("555", 1L, 250000L, 2500.0)))
  }
}
