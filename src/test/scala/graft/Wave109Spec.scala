package graft

import graft.queries.Breadth105
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the hundred-sixth wave (Breadth105
  * weighted median / category transitions / spend trajectory). */
class Wave109Spec extends SparkSpec {
  import spark.implicits._

  test("weightedMedian picks the 2·cumw crossing value") {
    val part = Seq((1L, "B1")).toDF("p_partkey", "p_brand")
    // prices 1.00 (w 1), 2.00 (w 2), 3.00 (w 1): tot 4, crossing at
    // cumw 2 → v = 2.00 (pre·2 = 2 < 4, (pre+cw)·2 = 6 ≥ 4)
    val li = Seq((1L, 1.0, 1.0), (1L, 2.0, 2.0), (1L, 3.0, 1.0))
      .toDF("l_partkey", "l_extendedprice", "l_quantity")
    val r = Breadth105.weightedMedian(part, li).collect()(0)
    assert(r.getLong(1) === 3L && r.getLong(2) === 4L)
    assert(r.getDouble(3) === 2.0)
  }

  test("categoryTransitions: dominant type per order, lagged per customer") {
    val part = Seq((1L, "A"), (2L, "B")).toDF("p_partkey", "p_type")
    val orders = Seq((10L, 1L, "2024-01-01"), (11L, 1L, "2024-01-02"))
      .toDF("o_orderkey", "o_custkey", "at")
      .withColumn("o_orderdate", to_timestamp_ntz(col("at"))).drop("at")
    // order 10 dominated by A (qty 5 vs 1), order 11 by B → one A→B
    val li = Seq((10L, 1L, 5.0), (10L, 2L, 1.0), (11L, 2L, 3.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity")
    val got = Breadth105.categoryTransitions(orders, li, part)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got === Seq(("A", "B", 1L)))
  }

  test("spendTrajectory: sign census on the exact integer numerator") {
    val orders = Seq(
      (10L, 1L, "2024-01-01", 1.0), (11L, 1L, "2024-01-02", 2.0),
      (12L, 2L, "2024-01-01", 5.0), (13L, 2L, "2024-01-02", 3.0),
      (14L, 3L, "2024-01-01", 4.0)) // single order → excluded
      .toDF("o_orderkey", "o_custkey", "at", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp_ntz(col("at"))).drop("at")
    val r = Breadth105.spendTrajectory(orders).collect()(0)
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === 1L && r.getLong(2) === 1L && r.getLong(3) === 0L)
    // slopes: +100 and −200 cents/order → mean −50 cents = −0.5 dollars
    assert(r.getDouble(4) === -0.5)
  }
}
