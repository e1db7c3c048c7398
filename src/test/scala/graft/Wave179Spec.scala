package graft

import graft.queries.Breadth170
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-seventy-first wave (Breadth170 Burrows'
  * Delta stylometry). */
class Wave179Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String)]) =
    rows.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("twin sources collapse to delta 0; the odd one out is far") {
    // a and b share the style (same token mix); c is all-'zzz'.
    val d = docs(Seq(
      (1L, "a", "the of the and the of"),
      (2L, "b", "the of the and the of"),
      (3L, "c", "zzz zzz zzz zzz zzz zzz")))
    val pairs = Breadth170.burrowsDelta(d).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        r.getAs[Double]("delta")).toMap
    assert(pairs(("a", "b")) == 0.0)
    assert(pairs(("a", "c")) > 1.0)
    assert(pairs(("a", "c")) == pairs(("b", "c")))
    // most-similar-first ordering
    val ordered = Breadth170.burrowsDelta(d).collect()
      .map(_.getAs[Double]("delta"))
    assert(ordered.zip(ordered.tail).forall { case (x, y) => x <= y })
  }

  test("z-scores per token sum to ~0 across sources and respect the " +
    "frequency ordering") {
    val d = Tables.documents(spark, sf0001)
    val prof = Breadth170.zGrid(d, 20).collect()
    prof.groupBy(_.getAs[String]("tok")).foreach { case (_, rs) =>
      val zs = rs.map(_.getAs[Double]("z"))
      // integer-quantized frequencies: the z's sum only approximately
      assert(math.abs(zs.sum) < 1e-6 * math.max(1.0, zs.length))
      // z order matches frequency order
      val sorted = rs.sortBy(_.getAs[Long]("f1e6"))
      val zByF = sorted.map(_.getAs[Double]("z"))
      assert(zByF.zip(zByF.tail).forall { case (x, y) => x <= y + 1e-12 })
    }
  }

  test("profile query is the 5-token slice with grid density") {
    val d = Tables.documents(spark, sf0001)
    val prof = Breadth170.styloProfile(d).collect()
    val srcs = prof.map(_.getAs[String]("source")).distinct
    val toks = prof.map(_.getAs[String]("tok")).distinct
    assert(toks.length == 5)
    // dense: every (source, token) cell present
    assert(prof.length == srcs.length * 5)
    val delta = Breadth170.burrowsDelta(d).collect()
    assert(delta.length == 10)
    delta.foreach(r => assert(r.getAs[Double]("delta") >= 0.0))
  }
}
