package graft

import graft.queries.Breadth95
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the ninety-sixth wave (Breadth95 TPC-H
  * Q7/Q8/Q12/Q13 skeletons). */
class Wave98Spec extends SparkSpec {
  import spark.implicits._

  private val nation = Seq((0L, "N_A", 0L), (1L, "N_B", 0L), (2L, "N_C", 1L))
    .toDF("n_nationkey", "n_name", "n_regionkey")
  private val region = Seq((0L, "R_X"), (1L, "R_Y"))
    .toDF("r_regionkey", "r_name")
  private val supplier = Seq((10L, 0L), (11L, 1L), (12L, 2L))
    .toDF("s_suppkey", "s_nationkey")
  private val customer = Seq((20L, 0L), (21L, 1L), (22L, 2L))
    .toDF("c_custkey", "c_nationkey")

  private def d(s: String) = to_timestamp_ntz(lit(s))

  test("volumeShipping keeps both directions of the pair and years") {
    val orders = Seq((30L, 20L), (31L, 21L), (32L, 22L))
      .toDF("o_orderkey", "o_custkey")
      .withColumn("o_orderdate", d("1996-01-01"))
    // A→B in 1996 (rev 10.00 @ no disc), B→A in 1997, C→A excluded
    val li = Seq(
      (30L, 11L, "1996-03-01", 10.0, 0.0),  // supp N_B → cust N_A
      (31L, 10L, "1997-03-01", 20.0, 0.5),  // supp N_A → cust N_B
      (31L, 12L, "1997-03-01", 99.0, 0.0))  // supp N_C → excluded
      .toDF("l_orderkey", "l_suppkey", "at", "l_extendedprice",
        "l_discount")
      .withColumn("l_shipdate", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth95.volumeShipping(nation, supplier, customer, orders,
        li, "N_A", "N_B")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got === Seq(
      ("N_A", "N_B", 1997L, 1L, 20.0 * 0.5),
      ("N_B", "N_A", 1996L, 1L, 10.0)))
  }

  test("marketShare: conditional numerator over the region total") {
    val part = Seq((40L, "ECONOMY"), (41L, "LARGE"))
      .toDF("p_partkey", "p_type")
    val orders = Seq((30L, 22L)).toDF("o_orderkey", "o_custkey")
      .withColumn("o_orderdate", d("1998-06-01"))
    // cust 22 is in nation N_C / region R_Y; suppliers 12 (N_C) and 10
    // (N_A): share of N_C = 30 / (30 + 10)
    val li = Seq(
      (30L, 40L, 12L, 30.0, 0.0),
      (30L, 40L, 10L, 10.0, 0.0),
      (30L, 41L, 12L, 99.0, 0.0))  // wrong p_type
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
      .withColumn("l_shipdate", d("1998-07-01"))
    val got = Breadth95.marketShare(region, nation, supplier, customer,
        orders, li, part, "N_C", "R_Y", "ECONOMY")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got === Seq((1998L, 30.0, 40.0, 0.75)))
  }

  test("priorityDelay buckets by ship lag and splits priorities") {
    val orders = Seq((30L, "1-URGENT"), (31L, "5-LOW"))
      .toDF("o_orderkey", "o_orderpriority")
      .withColumn("o_orderdate", d("1996-01-01"))
    val li = Seq(
      (30L, "1996-01-10"),  // 9d  → a_fast, high
      (30L, "1996-03-10"),  // 69d → b_medium, high
      (31L, "1996-07-01"))  // 182d → c_slow, low
      .toDF("l_orderkey", "at")
      .withColumn("l_shipdate", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth95.priorityDelay(orders, li)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got === Seq(("a_fast", 1L, 0L), ("b_medium", 1L, 0L),
      ("c_slow", 0L, 1L)))
  }

  test("custdist keeps zero-order customers via the left join") {
    val orders = Seq((30L, 20L), (31L, 20L), (32L, 21L))
      .toDF("o_orderkey", "o_custkey")
    val got = Breadth95.custdist(customer, orders)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // cust 20 → 2 orders, 21 → 1, 22 → 0
    assert(got === Seq((2L, 1L), (1L, 1L), (0L, 1L)))
  }
}
