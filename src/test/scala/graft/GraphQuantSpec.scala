package graft

import graft.queries.Extensions11
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the twelfth extension wave (Extensions11 —
  * integer PageRank, int8 embedding quantization, co-occurrence lift). */
class GraphQuantSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: one hand-computed iteration on a 4-node bipartite graph") {
    // s1 -> {p1, p2}, s2 -> {p2}; N = 4, all ranks seed at 10^9.
    // dangling = {p1, p2}: D = 2e9, dang share = 17*2e9 // 80 = 425e6
    // contribs: s1 sends 17e9 // 40 = 425e6 to each; s2 sends 17e9 // 20 = 850e6
    val edges = Seq(("s1", "p1"), ("s1", "p2"), ("s2", "p2"))
      .toDF("src", "dst")
    val got = Extensions11.pageRank(edges, iters = 1)
      .orderBy("node").as[(String, Long)].collect().toSeq
    assert(got === Seq(
      ("p1", 150000000L + 425000000L + 425000000L),
      ("p2", 150000000L + 425000000L + 850000000L + 425000000L),
      ("s1", 150000000L + 425000000L),
      ("s2", 150000000L + 425000000L)))
  }

  test("pageRank: mass is conserved up to floor loss over 5 iterations, " +
    "and sinks outrank sources") {
    val edges = Seq(("s1", "p1"), ("s1", "p2"), ("s2", "p2"), ("s3", "p1"),
      ("s3", "p3"), ("s2", "p3")).toDF("src", "dst")
    val r = Extensions11.pageRank(edges).as[(String, Long)].collect().toMap
    val n = r.size
    assert(n === 6)
    val mass = r.values.sum
    // every floor division loses < 1 micro-rank unit; per iteration
    // that is < (edges + nodes + 1) units
    assert(mass <= n * Extensions11.PrScale)
    assert(mass > n * Extensions11.PrScale - 5L * (6 + 6 + 1))
    // the bipartite sinks hold more rank than the sources
    assert(Seq("p1", "p2", "p3").map(r).min > Seq("s1", "s2", "s3").map(r).max)
  }

  test("quantizeInt8: round-half-up cent codes, exact dequantization, " +
    "zero vectors dropped") {
    val emb = Seq(
      (1L, Seq(3.0f, -1.5f, 0.75f)),
      (2L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Extensions11.quantizeInt8(emb, "vec_id", "embedding")
      .select("vec_id", "mx", "dv")
      .as[(Long, Double, Seq[Double])].collect().toSeq
    assert(got.map(_._1) === Seq(1L)) // zero vector dropped
    val (_, mx, dv) = got.head
    assert(mx === 3.0)
    // q = floor(x*127/3 + 0.5) = (127, -63, 32); dq = q*3/127
    assert(dv === Seq(127.0 * 3.0 / 127.0, -63.0 * 3.0 / 127.0,
      32.0 * 3.0 / 127.0))
  }

  test("featureHash: occurrences accumulate signed in their md5 bucket; " +
    "cancelled buckets drop; vectors are bounded by the bucket count") {
    val docs = Seq(
      (1L, "x x x"),        // one token, multiplicity 3 -> one bucket, |w| = 3
      (2L, "x y x y")       // two tokens, multiplicity 2 each
    ).toDF("doc_id", "text")
    val rows = Extensions11.featureHash(docs, "text", "doc_id", 64L)
      .as[(Long, Long, Long)].collect().toSeq
    val d1 = rows.filter(_._1 == 1L)
    assert(d1.size === 1 && math.abs(d1.head._3) === 3)
    // doc 2: x lands in doc 1's bucket with 2/3 of its weight (same
    // sign, multiplicity 2 not 3); y adds a |w| = 2 bucket of its own
    // (md5("x") and md5("y") bucket apart in the 64-bucket space)
    val d2 = rows.filter(_._1 == 2L).map(r => (r._2, r._3)).toMap
    assert(d2.size === 2)
    assert(d2(d1.head._2) === d1.head._3 / 3 * 2)
    assert(d2.values.map(math.abs).toSeq.sorted === Seq(2L, 2L))
    // every bucket id is in range; zero weights are filtered
    assert(rows.forall(r => r._2 >= 0 && r._2 < 64 && r._3 != 0))
  }
}
