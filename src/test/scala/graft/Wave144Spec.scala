package graft

import graft.queries.Breadth136

/** Fixtures for the hundred-thirty-seventh wave (Breadth136 k-center
  * coreset + curriculum interleave). */
class Wave144Spec extends SparkSpec {
  import spark.implicits._

  test("kcenter: seed at min id, then the max-min greedy picks the " +
    "antipode before the orthogonal vector") {
    // unit circle: 0 → (1,0); 1 → near-copy of 0; 2 → (0,1); 3 → (−1,0)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.999f, 0.04f), 0),
      (2L, Array(0.0f, 1.0f), 0),
      (3L, Array(-1.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = Breadth136.kcenter(emb, k = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    // pick 2: argmin of max-cos to {0} → the antipode 3 (cos −1);
    // pick 3: max-cos to {0,3} is 0 for vector 2, ~1 for the clone 1
    assert(got.toSeq === Seq((1, 0L, None), (2, 3L, Some(-1000000L)),
      (3, 2L, Some(0L))))
  }

  test("kcenter: k past the corpus size selects everything exactly once") {
    val emb = Seq(
      (7L, Array(1.0f, 0.0f), 0),
      (9L, Array(0.0f, 1.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = Breadth136.kcenter(emb, k = 2).collect()
    assert(got.map(_.getLong(1)).toSet === Set(7L, 9L))
    assert(got.map(_.getInt(0)).toSeq === Seq(1, 2))
  }

  test("curriculum: round-robin across sources by per-source length " +
    "rank, source name breaking rank ties") {
    val docs = Seq(
      (1L, "aaaaaaaaaa", "en", "srcA", 10L),
      (2L, "aaaaaaaa", "en", "srcA", 8L),
      (3L, "aaaaaa", "en", "srcA", 6L),
      (4L, "bbbbbbbbb", "en", "srcB", 9L),
      (5L, "bbbbbbb", "en", "srcB", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Breadth136.curriculum(docs, n = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, "srcA", 1L, 1L), (2L, "srcB", 1L, 4L),
      (3L, "srcA", 2L, 2L), (4L, "srcB", 2L, 5L),
      (5L, "srcA", 3L, 3L)))
  }
}
