package graft

import graft.queries.Breadth81
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the eighty-second wave (Breadth81 TPC-H
  * Q3/Q4/Q5 skeletons). */
class Wave84Spec extends SparkSpec {
  import spark.implicits._

  private def ts(c: org.apache.spark.sql.Column) = to_timestamp_ntz(c)

  test("segmentBacklog: only segment customers' pre-cutoff orders with " +
    "post-cutoff lines surface, revenue exact, top-k tie-broken") {
    val customer = Seq((1L, "BUILDING"), (2L, "MACHINERY"), (3L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      (10L, 1L, "1997-06-01"), // in: BUILDING, pre-cutoff
      (11L, 2L, "1997-06-01"), // out: wrong segment
      (12L, 3L, "1998-02-01"), // out: post-cutoff order date
      (13L, 1L, "1997-07-01")) // in
      .toDF("o_orderkey", "o_custkey", "at")
      .withColumn("o_orderdate", ts(col("at"))).drop("at")
    val lineitem = Seq(
      // order 10: one open line 10.00 @ 10% -> 9.00, one shipped line
      (10L, "1998-03-01", 10.00, 0.10),
      (10L, "1997-08-01", 99.00, 0.00),
      // order 13: open line 5.00 @ 0% -> 5.00
      (13L, "1998-05-01", 5.00, 0.00),
      // order 11/12 lines (excluded upstream regardless)
      (11L, "1998-03-01", 7.00, 0.00),
      (12L, "1998-03-01", 7.00, 0.00))
      .toDF("l_orderkey", "at", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", ts(col("at"))).drop("at")
    val got = Breadth81.segmentBacklog(customer, orders, lineitem,
        "BUILDING", cutoff = "1998-01-01", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got === Seq((10L, 9.0), (13L, 5.0)))
  }

  test("latePriority: any-line-late flags collapse per order before " +
    "the priority rollup; lineless orders count as on-time") {
    val orders = Seq(
      (1L, "1-URGENT", "2024-01-01"),
      (2L, "1-URGENT", "2024-01-01"),
      (3L, "5-LOW", "2024-01-01"))
      .toDF("o_orderkey", "o_orderpriority", "at")
      .withColumn("o_orderdate", ts(col("at"))).drop("at")
    val lineitem = Seq(
      (1L, "2024-05-01"), // 121 days late
      (1L, "2024-01-10"), // on time (flag still 1 via max)
      (2L, "2024-02-01")) // 31 days -> on time; order 3 has no lines
      .toDF("l_orderkey", "at")
      .withColumn("l_shipdate", ts(col("at"))).drop("at")
    val got = Breadth81.latePriority(orders, lineitem, lateDays = 90)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === Seq(("1-URGENT", 2L, 1L, 0.5), ("5-LOW", 1L, 0L, 0.0)))
  }

  test("nationRevenue: per-customer revenue rolls up to the customer's " +
    "nation exactly") {
    val nation = Seq((1, "ALGERIA"), (2, "BRAZIL")).toDF("n_nationkey", "n_name")
    val customer = Seq((1L, 1), (2L, 1), (3L, 2))
      .toDF("c_custkey", "c_nationkey")
    val orders = Seq((10L, 1L), (11L, 2L), (12L, 3L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(
      (10L, 10.00, 0.10), // 9.00
      (10L, 1.00, 0.00),  // 1.00
      (11L, 2.50, 0.00),  // 2.50
      (12L, 4.00, 0.25))  // 3.00
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
    val got = Breadth81.nationRevenue(nation, customer, orders, lineitem)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got === Seq(("ALGERIA", 2L, 12.5), ("BRAZIL", 1L, 3.0)))
  }
}
