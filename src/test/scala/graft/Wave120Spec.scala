package graft

import graft.queries.Breadth114

/** Fixtures for the hundred-fifteenth wave (Breadth114 baskets /
  * dispersion / repurchase). */
class Wave120Spec extends SparkSpec {
  import spark.implicits._

  test("basketSizeDist: exact mean value per size bucket") {
    val li = Seq((1L, 1.0), (1L, 2.0), (2L, 5.0))
      .toDF("l_orderkey", "l_extendedprice")
    val got = Breadth114.basketSizeDist(li)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got === Seq((1L, 1L, 5.0), (2L, 1L, 3.0)))
  }

  test("priceDispersion: range over the rank-exact median") {
    // part 1 prices 1.00, 2.00, 5.00 → median 2.00, range 4.00
    val li = Seq((1L, 1.0), (1L, 2.0), (1L, 5.0))
      .toDF("l_partkey", "l_extendedprice")
    val r = Breadth114.priceDispersion(li).collect()(0)
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 4.0 && r.getDouble(3) === 2.0)
    assert(r.getDouble(4) === 2.0)
  }

  test("repurchaseRate counts distinct orders per (customer, part)") {
    val orders = Seq((1L, 10L), (2L, 10L), (3L, 11L), (4L, 12L),
      (5L, 13L), (6L, 14L)).toDF("o_orderkey", "o_custkey")
    // part 1: cust 10 buys in orders 1 AND 2 (repurchase); custs
    // 11..14 once each → 5 buyers, 1 repurchaser
    val li = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (6L, 1L)).toDF("l_orderkey", "l_partkey")
    val r = Breadth114.repurchaseRate(orders, li).collect()(0)
    assert(r.getLong(1) === 5L && r.getLong(2) === 1L)
    assert(r.getDouble(3) === 0.2)
  }
}
