package graft

import graft.queries.Breadth102
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the hundred-third wave (Breadth102 BM25 +
  * embedding geometry). */
class Wave105Spec extends SparkSpec {
  import spark.implicits._

  test("bm25: quantized idf, fixed-order term sum, doc-id tiebreak") {
    // 2 docs; "scan" in doc 1 twice (len 4), in doc 2 zero; "join" and
    // "window" absent everywhere (tf 0 → contribution 0).
    val docs = Seq((1L, "scan a scan b"), (2L, "c d e f"))
      .toDF("doc_id", "text")
    val got = Breadth102.bm25(docs, "text").collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getLong(0) === 1L && r.getLong(1) === 4L &&
      r.getLong(2) === 2L)
    // idf = floor(ln((2−1+.5)/(1+.5)+1)·1e6+.5) = floor(ln(2)·1e6+.5)
    val idf = math.floor(math.log(2.0) * 1e6 + 0.5)
    val avg = 8.0 / 2.0
    val c = idf * (2.0 * 2.25 / (2.0 + 1.25 * (0.25 + 0.75 * 4.0 / avg)))
    assert(r.getDouble(5) === c / 1e6)
  }

  test("dimStats: exact quantized per-dimension moments") {
    val emb = Seq((1L, Array(1.0f, 0.5f)), (2L, Array(3.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val got = Breadth102.dimStats(emb).collect()
    assert(got(0).getLong(0) === 1L && got(0).getDouble(2) === 2.0)
    // sd of {1e6, 3e6}: sqrt((2·(1e12+9e12) − 16e12)/2) = sqrt(2e12)
    assert(got(0).getDouble(3) === math.sqrt(2.0e12) / 1e6)
    assert(got(1).getDouble(2) === 0.5 && got(1).getDouble(3) === 0.0)
  }

  test("isotropy: identical vectors give cosine 1 to the centroid") {
    val emb = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val r = Breadth102.isotropy(emb).collect()(0)
    assert(r.getLong(0) === 2L)
    assert(math.abs(r.getDouble(1) - 1.0) < 2e-6)
    assert(r.getDouble(2) === r.getDouble(3))
  }
}
