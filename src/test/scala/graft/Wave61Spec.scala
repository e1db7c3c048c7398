package graft

import graft.queries.Breadth59

/** Closed-form fixtures for the sixtieth wave (Breadth59 market-basket
  * mining). */
class Wave61Spec extends SparkSpec {
  import spark.implicits._

  // baskets: {1,2} ×3, {1,3} ×1, {2,3} ×1, {4} ×1 → 6 orders
  private val lineitem = Seq(
    (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L),
    (12L, 2L), // duplicate line in the same order must not double-count
    (13L, 1L), (13L, 3L), (14L, 2L), (14L, 3L), (15L, 4L))
    .toDF("l_orderkey", "l_partkey")

  test("marketBasket: the dominant pair carries hand support, " +
    "confidences and lift; sub-threshold pairs drop") {
    val got = Breadth59.marketBasket(lineitem)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toSeq
    // only {1,2} reaches MinTogether=3: ca=4 (orders with part 1),
    // cb=4, N=6 → support 1/2, conf 3/4 both ways, lift 18/16
    assert(got === Seq((1L, 2L, 3L, 3.0 / 6.0, 3.0 / 4.0, 3.0 / 4.0,
      18.0 / 16.0)))
  }

  test("partAffinity: every part points at its most frequent partner; " +
    "the singleton part has no row") {
    val got = Breadth59.partAffinity(lineitem)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    // part 3 ties 1/2 at one co-basket each → smaller rival count wins;
    // both have cnt 4 → tie to the smaller partner id (1)
    assert(got === Seq((1L, 2L, 3L), (2L, 1L, 3L), (3L, 1L, 1L)))
  }
}
