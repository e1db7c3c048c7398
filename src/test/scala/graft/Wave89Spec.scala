package graft

import graft.queries.Breadth86
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the eighty-seventh wave (Breadth86 TPC-H
  * Q10/Q14/Q18 skeletons). */
class Wave89Spec extends SparkSpec {
  import spark.implicits._

  private def ts(c: org.apache.spark.sql.Column) = to_timestamp_ntz(c)

  test("returnedRevenue: only R-flagged lines count, rolled to the " +
    "customer with the nation name attached") {
    val nation = Seq((1, "ALGERIA")).toDF("n_nationkey", "n_name")
    val customer = Seq((1L, "Customer#1", 1), (2L, "Customer#2", 1))
      .toDF("c_custkey", "c_name", "c_nationkey")
    val orders = Seq((10L, 1L), (11L, 2L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(
      (10L, "R", 10.00, 0.10), // 9.00 returned
      (10L, "N", 99.00, 0.00), // kept -> excluded
      (11L, "R", 2.00, 0.00))  // 2.00 returned
      .toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
    val got = Breadth86.returnedRevenue(nation, customer, orders, lineitem)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === Seq((1L, "ALGERIA", 1L, 9.0), (2L, "ALGERIA", 1L, 2.0)))
  }

  test("promoShare: the share is exactly 100*promo/total per ship month") {
    val part = Seq((1L, "PROMO"), (2L, "STANDARD"))
      .toDF("p_partkey", "p_type")
    val lineitem = Seq(
      (1L, "1995-01-10", 1.00, 0.00), // promo 1.00
      (2L, "1995-01-20", 3.00, 0.00), // std   3.00
      (2L, "1995-02-05", 5.00, 0.00)) // std only in Feb
      .toDF("l_partkey", "at", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", ts(col("at"))).drop("at")
    val got = Breadth86.promoShare(part, lineitem)
      .collect().map(r => (r.getDate(0).toString, r.getDouble(1),
        r.getDouble(2), r.getDouble(3))).toSeq
    assert(got === Seq(
      ("1995-01-01", 1.0, 4.0, 25.0),
      ("1995-02-01", 0.0, 5.0, 0.0)))
  }

  test("bigOrders: the HAVING prunes before the join-back; ordering is " +
    "(qty desc, orderkey)") {
    val customer = Seq((1L, "Customer#1")).toDF("c_custkey", "c_name")
    val orders = Seq((10L, 1L, "1995-01-01"), (11L, 1L, "1995-01-02"),
      (12L, 1L, "1995-01-03"))
      .toDF("o_orderkey", "o_custkey", "at")
      .withColumn("o_orderdate", ts(col("at"))).drop("at")
    val lineitem = Seq(
      (10L, 150.0), (10L, 100.0), // 250 -> in
      (11L, 201.0),               // 201 -> in
      (12L, 200.0))               // 200 -> NOT > 200
      .toDF("l_orderkey", "l_quantity")
    val got = Breadth86.bigOrders(customer, orders, lineitem)
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5))).toSeq
    assert(got === Seq((10L, 2L, 250L), (11L, 1L, 201L)))
  }
}
