package graft

import graft.queries.Breadth166
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-sixty-seventh wave (Breadth166 vocabulary
  * richness estimators). */
class Wave175Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) =
    rows.map { case (id, text) =>
      (id, text, "en", "web", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("hand spectrum: Chao1 and Good-Turing match the formulas") {
    // tokens: a a a b b c d -> V=4, N=7, f1=2 (c,d), f2=1 (b)
    val d = docs(Seq((1L, "a a a b"), (2L, "b c d")))
    val r = Breadth166.vocabRichness(d).collect()(0)
    assert(r.getAs[Long]("n_tokens") == 7L)
    assert(r.getAs[Long]("vocab") == 4L)
    assert(r.getAs[Long]("f1") == 2L)
    assert(r.getAs[Long]("f2") == 1L)
    // chao1 = 4 + 2*1/(2*2) = 4.5
    assert(r.getAs[Double]("chao1") == 4.5)
    assert(r.getAs[Double]("gt_unseen_mass") == 2.0 / 7.0)
    assert(r.getAs[Double]("turing_coverage") == 1.0 - 2.0 / 7.0)
  }

  test("hand capture-recapture: disjoint and identical samples bound " +
    "the estimator") {
    // identical halves: n1 = n2 = m = V -> chapman = (V+1)^2/(V+1)-1 = V
    val same = docs(Seq((0L, "x y z"), (1L, "x y z")))
    val r1 = Breadth166.captureRecapture(same).collect()(0)
    assert(r1.getAs[Long]("m") == 3L)
    assert(r1.getAs[Double]("chapman") == 3.0)
    assert(r1.getAs[Double]("rel_err") == 0.0)
    // disjoint halves: m = 0 -> chapman = (n1+1)(n2+1) - 1
    val disj = docs(Seq((0L, "a b"), (1L, "c d")))
    val r2 = Breadth166.captureRecapture(disj).collect()(0)
    assert(r2.getAs[Long]("m") == 0L)
    assert(r2.getAs[Double]("chapman") == 8.0)
  }

  test("real corpus: estimators are coherent with the observed vocab") {
    val d = Tables.documents(spark, sf0001)
    val r = Breadth166.vocabRichness(d).collect()(0)
    val v = r.getAs[Long]("vocab")
    assert(r.getAs[Double]("chao1") >= v.toDouble)
    val gt = r.getAs[Double]("gt_unseen_mass")
    assert(gt >= 0.0 && gt <= 1.0)
    assert(r.getAs[Double]("turing_coverage") == 1.0 - gt)
    assert(r.getAs[Long]("f1") + 2 * r.getAs[Long]("f2") <=
      r.getAs[Long]("n_tokens"))

    val cr = Breadth166.captureRecapture(d).collect()(0)
    assert(cr.getAs[Long]("m") <=
      math.min(cr.getAs[Long]("n1"), cr.getAs[Long]("n2")))
    assert(cr.getAs[Long]("vocab_true") == v)
    // Chapman never exceeds the disjoint bound and never undershoots
    // the larger sample
    assert(cr.getAs[Double]("chapman") >=
      math.max(cr.getAs[Long]("n1"), cr.getAs[Long]("n2")).toDouble - 1.0)
  }
}
