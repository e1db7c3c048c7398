package graft

import graft.queries.Breadth96
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the ninety-seventh wave (Breadth96 TPC-H
  * Q2/Q9/Q15/Q17 skeletons). */
class Wave99Spec extends SparkSpec {
  import spark.implicits._

  private val nation = Seq((0L, "N_A"), (1L, "N_B"))
    .toDF("n_nationkey", "n_name")
  private val supplier = Seq((10L, 0L, "S_X"), (11L, 1L, "S_Y"))
    .toDF("s_suppkey", "s_nationkey", "s_name")

  test("minCostSupplier keeps all suppliers tied at the part minimum") {
    val part = Seq((40L, "bolt", "SMALL", 5), (41L, "nut", "LARGE", 5))
      .toDF("p_partkey", "p_name", "p_type", "p_size")
    val li = Seq(
      (40L, 10L, 2.0, 10.0),   // unit 5.00
      (40L, 11L, 1.0, 5.0),    // unit 5.00 — tie
      (40L, 11L, 1.0, 9.0),    // unit 9.00 ignored (min per supplier)
      (41L, 10L, 1.0, 1.0))    // wrong type
      .toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    val got = Breadth96.minCostSupplier(part, supplier, nation, li,
        "SMALL", 10)
      .collect().map(r => (r.getLong(0), r.getString(3), r.getString(4),
        r.getDouble(5))).toSeq
    assert(got === Seq((40L, "S_X", "N_A", 5.0), (40L, "S_Y", "N_B", 5.0)))
  }

  test("productProfit: rev minus half-retail cost, by nation and year") {
    val part = Seq((40L, "red bolt", 2.0), (41L, "blue nut", 2.0))
      .toDF("p_partkey", "p_name", "p_retailprice")
    val orders = Seq(Tuple1(30L)).toDF("o_orderkey")
      .withColumn("o_orderdate", to_timestamp_ntz(lit("1997-05-01")))
    // rev = 10.00·(100-0)% = 10.00; cost = 3·2.00·50% = 3.00 → 7.00
    val li = Seq((30L, 40L, 10L, 3.0, 10.0, 0.0), // red, counted
      (30L, 41L, 10L, 1.0, 99.0, 0.0))            // not red
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
    val got = Breadth96.productProfit(part, supplier, nation, orders, li,
        "red")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === Seq(("N_A", 1997L, 1L, 7.0)))
  }

  test("topSupplier: quarter-bounded exact revenue, ties preserved") {
    val li = Seq(
      (10L, "1997-02-01", 10.0, 0.0),
      (11L, "1997-03-31", 10.0, 0.0),  // tie at 10.00
      (11L, "1997-04-01", 99.0, 0.0))  // outside the quarter
      .toDF("l_suppkey", "at", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth96.topSupplier(supplier, li, "1997-01-01")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq
    assert(got === Seq((10L, "S_X", 10.0), (11L, "S_Y", 10.0)))
  }

  test("smallQtyRevenue: 5·q·n < Σq cross-multiplied threshold") {
    val part = Seq((40L, "Brand#1"), (41L, "Brand#2"))
      .toDF("p_partkey", "p_brand")
    // part 40: quantities 1,10,10,10 → Σ=31, n=4; 5·1·4=20 < 31 → only
    // the q=1 line (price 7.00) qualifies; 5·10·4=200 ≥ 31 excluded.
    val li = Seq(
      (40L, 1.0, 7.0), (40L, 10.0, 1.0), (40L, 10.0, 1.0),
      (40L, 10.0, 1.0), (41L, 1.0, 99.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val r = Breadth96.smallQtyRevenue(part, li, "Brand#1").collect()(0)
    assert(r.getLong(0) === 1L)
    assert(r.getDouble(1) === 7.0 / 52.0)
  }
}
