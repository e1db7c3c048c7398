package graft

import graft.queries.Breadth165
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-sixty-sixth wave (Breadth165 MRR and
  * hit@k retrieval evaluation). */
class Wave174Spec extends SparkSpec {
  import spark.implicits._

  private def pad(v: Seq[Float]): Array[Float] =
    (v ++ Seq.fill(64 - v.length)(0.0f)).toArray

  test("hand corpus: first-hit ranks and MRR match by construction") {
    // probe 0 (label 7): nearest is 21 (label 3), second 22 (label 7)
    // -> first_hit_rank 2, rr = 5e8.
    // probe 1 (label 9): no other label-9 vector -> rr = 0, rank null.
    val emb = Seq(
      (0L, pad(Seq(1.0f, 0.0f)), 7),
      (1L, pad(Seq(0.0f, 1.0f)), 9),
      (21L, pad(Seq(0.99f, 0.05f)), 3),
      (22L, pad(Seq(0.9f, 0.3f)), 7))
      .toDF("vec_id", "embedding", "label")
    val fh = Breadth165.firstHitTable(emb).collect()
      .map(r => r.getAs[Long]("probe_id") ->
        (Option(r.get(r.fieldIndex("first_hit_rank"))),
          r.getAs[Long]("rr_1e9"))).toMap
    assert(fh(0L) == (Some(2L), 500000000L))
    assert(fh(1L) == (None, 0L))
    val m = Breadth165.mrr(emb).collect()(0)
    assert(m.getAs[Long]("n_probes") == 2L)
    assert(m.getAs[Double]("mrr") == 5e8 / 2e9)
    assert(m.getAs[Double]("hit1") == 0.0)
    assert(m.getAs[Double]("hit5") == 0.5)
  }

  test("real corpus: 20 probes, rr consistent with rank, hits nested") {
    val emb = Tables.embeddings(spark, sf0001)
    val fh = Breadth165.firstHitTable(emb).collect()
    assert(fh.length == 20)
    fh.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("first_hit_rank"))) {
        val rank = r.getAs[Long]("first_hit_rank")
        assert(r.getAs[Long]("rr_1e9") == 1000000000L / rank)
        assert(rank >= 1L)
      } else assert(r.getAs[Long]("rr_1e9") == 0L)
    }
    val m = Breadth165.mrr(emb).collect()(0)
    val (h1, h5, h10) = (m.getAs[Double]("hit1"), m.getAs[Double]("hit5"),
      m.getAs[Double]("hit10"))
    assert(h1 <= h5 && h5 <= h10)
    assert(m.getAs[Double]("mrr") >= 0.0 && m.getAs[Double]("mrr") <= 1.0)
    // MRR >= hit1 * 1 (a rank-1 hit contributes its full weight)
    assert(m.getAs[Double]("mrr") >= h1 - 1e-12)
    // MRR <= hit-anything share (each rr <= 1)
    val anyHit = fh.count(r =>
      !r.isNullAt(r.fieldIndex("first_hit_rank"))).toDouble / fh.length
    assert(m.getAs[Double]("mrr") <= anyHit + 1e-12)
  }
}
