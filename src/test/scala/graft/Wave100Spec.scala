package graft

import graft.queries.Breadth97
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the ninety-eighth wave (Breadth97 TPC-H
  * Q11/Q16/Q19/Q20/Q21/Q22 skeletons). */
class Wave100Spec extends SparkSpec {
  import spark.implicits._

  private val nation = Seq((0L, "N_A"), (1L, "N_B"))
    .toDF("n_nationkey", "n_name")

  test("importantParts: cross-multiplied vs-average threshold") {
    // revenues 99.00 and 1.00 → avg 50.00; at 1.5× avg (pct10=15) only
    // part 1 passes: 99·2·10 > 100·15 ✓, 1·2·10 < 1500 ✗.
    val li = Seq((1L, 99.0, 0.0), (2L, 1.0, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val got = Breadth97.importantParts(li, pct10 = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === Seq((1L, 99.0)))
  }

  test("supplierPartCounts excludes blacklisted suppliers pre-distinct") {
    val part = Seq((1L, "B1", "T1", 5)).toDF("p_partkey", "p_brand",
      "p_type", "p_size")
    val supplier = Seq((10L, 100.0), (11L, 9999.0))
      .toDF("s_suppkey", "s_acctbal")
    val li = Seq((1L, 10L), (1L, 10L), (1L, 11L))
      .toDF("l_partkey", "l_suppkey")
    val got = Breadth97.supplierPartCounts(part, supplier, li, 2000.0)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3))).toSeq
    assert(got === Seq(("B1", "T1", 5, 1L))) // supp 10 blacklisted
  }

  test("disjunctiveRevenue sums only the matching OR arms") {
    val part = Seq((1L, "Brand#17", 3), (2L, "Brand#4", 8),
      (3L, "Brand#25", 20))
      .toDF("p_partkey", "p_brand", "p_size")
    val li = Seq(
      (1L, 5.0, 10.0, 0.0),   // arm1 ✓ (qty 5 in 1..11, size 3 in 1..5)
      (1L, 50.0, 99.0, 0.0),  // qty out of band
      (2L, 15.0, 20.0, 0.5),  // arm2 ✓ → 20.00·50% = 10.00
      (3L, 25.0, 99.0, 0.0))  // size 20 > 15 → out
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val r = Breadth97.disjunctiveRevenue(part, li).collect()(0)
    assert(r.getLong(0) === 2L)
    assert(r.getDouble(1) === 20.0)
  }

  test("excessShippers: 2·q·n > 3·Σq per part, semi-joined to suppliers") {
    val part = Seq((1L, "red bolt"), (2L, "blue nut"))
      .toDF("p_partkey", "p_name")
    val supplier = Seq((10L, 0L, "S_X"), (11L, 0L, "S_Y"))
      .toDF("s_suppkey", "s_nationkey", "s_name")
    // part 1 in 1997: supp 10 ships 90, supp 11 ships 10 → n=2, Σ=100;
    // supp10: 2·90·2=360 > 300 ✓; supp11: 40 < 300 ✗
    val li = Seq(
      (1L, 10L, "1997-05-01", 90.0),
      (1L, 11L, "1997-05-01", 10.0),
      (2L, 11L, "1997-05-01", 1000.0)) // not a red part
      .toDF("l_partkey", "l_suppkey", "at", "l_quantity")
      .withColumn("l_shipdate", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth97.excessShippers(part, supplier, nation, li, "red",
        1997)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq
    assert(got === Seq((10L, "S_X", "N_A")))
  }

  test("waitingSuppliers: sole late shipper of a multi-supplier order") {
    val supplier = Seq((10L, "S_X"), (11L, "S_Y"))
      .toDF("s_suppkey", "s_name")
    val orders = Seq((1L, "1996-01-01"), (2L, "1996-01-01"))
      .toDF("o_orderkey", "at")
      .withColumn("o_orderdate", to_timestamp_ntz(col("at"))).drop("at")
    val li = Seq(
      // order 1: supp 10 late, supp 11 on time → 10 waits
      (1L, 10L, "1996-06-01"), (1L, 11L, "1996-01-10"),
      // order 2: both late → neither counts (nl=2)
      (2L, 10L, "1996-06-01"), (2L, 11L, "1996-06-01"))
      .toDF("l_orderkey", "l_suppkey", "at")
      .withColumn("l_shipdate", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth97.waitingSuppliers(supplier, orders, li)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("S_X", 1L)))
  }

  test("idleCustomers: above-average balance and anti-joined on recency") {
    val customer = Seq(
      (20L, 0L, 100.0),  // above avg(60.5)=… but has a recent order
      (21L, 0L, 90.0),   // above avg, idle → kept
      (22L, 0L, 1.0),    // below avg
      (23L, 1L, -50.0))  // negative, excluded from avg and result
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    // avg positive = (100+90+1)/3 = 63.666…; cents: bal·3 > 19100
    val orders = Seq((30L, 20L, "2000-01-01"))
      .toDF("o_orderkey", "o_custkey", "at")
      .withColumn("o_orderdate", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth97.idleCustomers(customer, orders, nation,
        "1999-01-01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got === Seq(("N_A", 1L, 90.0)))
  }
}
