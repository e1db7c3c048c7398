package graft

import graft.queries.Extensions12
import org.apache.spark.sql.functions._

/** Fixtures for the training-curation wave (Extensions12: deterministic
  * quantized k-means + DSIR importance weights). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("quantVecs: float components quantize to exact 1e-6-unit integers, " +
    "negative values flooring DOWN") {
    val got = Extensions12.quantVecs(vecs(Seq(
      (1L, Seq(0.5f, -0.5f, 0.0f, -0.0000005f)))))
      .select("qv").as[Seq[Long]].collect().head
    assert(got === Seq(500000L, -500000L, 0L, -1L))
  }

  test("seedCentroids: exactly K seeds, ids 0..K-1 in md5 order, stable " +
    "across runs") {
    val data = vecs((1L to 20L).map(i => (i, Seq.fill(4)(i.toFloat / 100))))
    val q = Extensions12.quantVecs(data)
    val a = Extensions12.seedCentroids(q).orderBy("cid")
      .as[(Long, Seq[Long])].collect().toSeq
    val b = Extensions12.seedCentroids(q).orderBy("cid")
      .as[(Long, Seq[Long])].collect().toSeq
    assert(a.map(_._1) === (0L until Extensions12.K.toLong))
    assert(a === b)
    // md5 order, not id order: cid k carries the vector of the k-th
    // smallest md5(id) — recomputed by hand
    val ids = (1L to 20L).map(i =>
      (org.apache.commons.codec.digest.DigestUtils.md5Hex(i.toString), i))
      .sorted.take(Extensions12.K).map(_._2)
    val expected = ids.map(i =>
      math.floor((i.toFloat / 100).toDouble * 1e6).toLong)
    assert(a.map(_._2.head) === expected)
  }

  test("kmeansAssign: every vector lands on its true nearest FINAL " +
    "centroid (hand-recomputed), with the exact integer distance") {
    // two tight blobs on opposite corners + a few stragglers
    val data = vecs(
      (1L to 6L).map(i => (i, Seq(0.1f + i * 0.001f, 0.1f, 0.0f, 0.0f))) ++
      (7L to 12L).map(i => (i, Seq(-0.4f, -0.4f + i * 0.001f, 0.0f, 0.0f))))
    val q = Extensions12.quantVecs(data)
    val a1 = Extensions12.assign(q, Extensions12.seedCentroids(q))
    val cents = Extensions12.update(a1)
      .as[(Long, Seq[Long])].collect().toMap
    val got = Extensions12.kmeansAssign(data)
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val qs = q.as[(Long, Seq[Long])].collect().toMap
    qs.foreach { case (id, v) =>
      val d2 = cents.map { case (cid, c) =>
        (cid, v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      }
      val best = d2.minBy { case (cid, d) => (d, cid) }
      assert(got(id) === ((best._1, best._2)), s"vec $id")
    }
  }

  test("dsirWeights: hand-computed add-one log-ratio weights on a " +
    "three-doc corpus, target docs scoring above the off-target doc") {
    val docs = Seq(
      (1L, "a a b", "en"), (2L, "b c", "en"), (3L, "c d", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = Extensions12.dsirWeights(docs, "en")
      .orderBy("doc_id")
      .select("doc_id", "lang", "n_tokens", "dsir_w")
      .as[(Long, String, Long, Double)].collect().toSeq
    // corpus: a2 b2 c2 d1, Ns=7, V=4 ; target(en): a2 b2 c1, Nt=5
    // w(a)=w(b)=ln((3/9)/(3/11)), w(c)=ln((2/9)/(3/11)), w(d)=ln((1/9)/(2/11))
    val wa = math.log((3.0 / 9) / (3.0 / 11))
    val wc = math.log((2.0 / 9) / (3.0 / 11))
    val wd = math.log((1.0 / 9) / (2.0 / 11))
    assert(got.map(t => (t._1, t._2, t._3)) ===
      Seq((1L, "en", 3L), (2L, "en", 2L), (3L, "fr", 2L)))
    def r4(x: Double) = BigDecimal.decimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // addend sets mirror the engine's per-token c·w terms (addition of
    // the same two operands is order-free in IEEE)
    assert(math.abs(got(0)._4 - r4(2 * wa + wa)) < 1e-9)
    assert(math.abs(got(1)._4 - r4(wa + wc)) < 1e-9)
    assert(math.abs(got(2)._4 - r4(wc + wd)) < 1e-9)
    // the en docs outscore the fr doc (that's what the weight is FOR)
    assert(got(0)._4 > got(2)._4 && got(1)._4 > got(2)._4)
  }
}
