package graft

import graft.queries.Breadth125

/** Fixtures for the hundred-twenty-sixth wave (Breadth125 RRF
  * fusion). */
class Wave132Spec extends SparkSpec {

  test("rrfFusion: per-probe top-5, scores recompute exactly from the " +
    "carried ranks, order follows the score") {
    val got = Breadth125.rrfFusion(spark, "/root/testdata/sf0.001")
      .collect()
    val byProbe = got.groupBy(_.getLong(0))
    assert(byProbe.size === 10 && byProbe.values.forall(_.length === 5))
    got.foreach { r =>
      val ra = if (r.isNullAt(4)) None else Some(r.getInt(4))
      val rb = if (r.isNullAt(5)) None else Some(r.getInt(5))
      val want = ra.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        rb.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
      assert(r.getDouble(3) === want)
      assert(ra.isDefined || rb.isDefined)
    }
    byProbe.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(1))
      sorted.sliding(2).foreach { p =>
        if (p.length == 2)
          assert(p(0).getDouble(3) >= p(1).getDouble(3))
      }
    }
  }

  test("rrfFusion: a both-lists candidate beats a single-list one at " +
    "equal ranks — the fusion bonus") {
    val got = Breadth125.rrfFusion(spark, "/root/testdata/sf0.001")
      .collect()
    val dual = got.filter(r => !r.isNullAt(4) && !r.isNullAt(5))
    val single = got.filter(r => r.isNullAt(4) ^ r.isNullAt(5))
    // the corpus produces both kinds at this SF (PQ disagrees with
    // exact often enough); every dual candidate with ranks (a, b)
    // outscores any single candidate with rank min(a, b)
    assert(dual.nonEmpty && single.nonEmpty)
    val worstDual = dual.map(_.getDouble(3)).min
    val bestPossibleSingle = 1.0 / 61.0
    // a dual hit scores > 1/65 + 1/65; a single hit caps at 1/61
    assert(worstDual > 2.0 / 65.0)
    assert(single.forall(_.getDouble(3) <= bestPossibleSingle))
  }
}
