package graft

import graft.queries.Breadth135
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-thirty-sixth wave (Breadth135 Gumbel
  * top-k sampling). */
class Wave143Spec extends SparkSpec {
  import spark.implicits._

  test("gumbelTopK: a dominant weight is effectively always sampled, " +
    "picks are without replacement and deterministic") {
    // doc 1 made overwhelmingly en-like (its tokens exist only in en
    // docs → huge positive dsir_w); fillers share one neutral token
    val docs = (Seq(
      (1L, "en", "alpha alpha alpha alpha alpha alpha alpha alpha"),
      (2L, "en", "alpha common")) ++
      (3L to 30L).map(i => (i, "de", "common")))
      .toDF("doc_id", "lang", "text")
    val a = Breadth135.gumbelTopK(docs, "en", 5).collect()
    val b = Breadth135.gumbelTopK(docs, "en", 5).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    assert(a.length === 5)
    assert(a.map(_.getLong(1)).distinct.length === 5)   // no replacement
    // doc 1's log-weight dwarfs every Gumbel draw's range here
    assert(a.head.getLong(1) === 1L)
    // picks are ordered by the sampling key
    val keys = a.map(_.getDouble(5))
    assert(keys.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }
}
