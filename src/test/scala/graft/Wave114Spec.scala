package graft

import graft.queries.Breadth109
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the hundred-tenth wave (Breadth109
  * distribution distances). */
class Wave114Spec extends SparkSpec {
  import spark.implicits._

  test("wasserstein1: point masses d apart have W1 = d") {
    val e = Seq(("click", 1.0), ("click", 1.0), ("purchase", 3.0))
      .toDF("event_type", "value")
    val r = Breadth109.wasserstein1(e, "event_type", "value", "click",
      "purchase").collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 1L)
    assert(r.getDouble(2) === 2.0)
  }

  test("energyDistance: identical distributions give zero") {
    val d = Seq(("src0", 10L), ("src0", 20L), ("src1", 10L),
      ("src1", 20L)).toDF("source", "n_chars")
    val r = Breadth109.energyDistance(d, "source", "n_chars", "src0",
      "src1").collect()(0)
    assert(r.getDouble(2) === 0.0)
    // point masses d apart: energy² = 2d − 0 − 0 = 2d
    val d2 = Seq(("src0", 10L), ("src1", 15L)).toDF("source", "n_chars")
    val r2 = Breadth109.energyDistance(d2, "source", "n_chars", "src0",
      "src1").collect()(0)
    assert(r2.getDouble(2) === 10.0)
  }

  test("qqDeciles: rank-exact side-by-side deciles") {
    val d = ((1 to 10).map(i => ("src0", i.toLong * 10)) ++
      (1 to 10).map(i => ("src1", i.toLong * 100)))
      .toDF("source", "n_chars")
    val got = Breadth109.qqDeciles(d, "source", "n_chars", "src0", "src1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    // decile k picks rank ceil(k·10/10) = k → k·10 vs k·100
    assert(got === (1 to 9).map(k => (k.toLong, k * 10L, k * 100L)).toSeq)
  }
}
