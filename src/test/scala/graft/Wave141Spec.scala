package graft

import graft.queries.Breadth133

/** Fixtures for the hundred-thirty-fourth wave (Breadth133 split
  * stratification balance). */
class Wave141Spec extends SparkSpec {

  test("splitBalance: shares sum to 1 per split, skews are bounded, " +
    "every (split, lang) cell accounted") {
    val got = Breadth133.splitBalance(spark, "/root/testdata/sf0.001")
      .collect()
    val bySplit = got.groupBy(_.getString(0))
    assert(bySplit.keySet === Set("train", "test"))
    bySplit.values.foreach { rows =>
      val tot = rows.map(_.getDouble(3)).sum
      assert(math.abs(tot - 1.0) < 1e-12)
    }
    // docs fully partitioned: counts add up to the corpus
    assert(got.map(_.getLong(2)).sum === 500L)
    // md5 is near-uniform: no language's split share strays more than
    // 10 points from its corpus share at 500 docs
    assert(got.forall(_.getDouble(4) < 0.10))
  }
}
