package graft

import graft.queries.Breadth126
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-twenty-seventh wave (Breadth126 MMR
  * diversification). */
class Wave133Spec extends SparkSpec {
  import spark.implicits._

  test("mmrDiversify: an exact duplicate of the first pick is demoted " +
    "below a diverse equally-relevant candidate") {
    // probe 0 = all ones; c1/c2 identical (8 flips at the tail,
    // cos 0.75 to the probe, cos 1.0 to each other); c3 equally
    // relevant (8 flips at the head) but only cos 0.5 to c1.
    def v(flipHead: Int, flipTail: Int): Seq[Float] =
      (Seq.fill(flipHead)(-1.0f) ++ Seq.fill(64 - flipHead - flipTail)(1.0f)
        ++ Seq.fill(flipTail)(-1.0f))
    val emb = Seq(
      (0L, Seq.fill(64)(1.0f), 0),
      (1L, v(0, 8), 0), (2L, v(0, 8), 0), (3L, v(8, 0), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Breadth126.mmrDiversify(emb).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    // relevance order alone would put the duplicate (id 2) at rank 2;
    // MMR demotes it behind the diverse c3
    assert(got.map(_._2).toSeq === Seq(1L, 3L, 2L))
    assert(got.head._3 === 0.75 && got(1)._3 === 0.75)
  }

  test("mmrDiversify on the corpus: 5 picks per probe, rank-1 equals " +
    "the relevance argmax, no duplicate picks") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = Breadth126.mmrDiversify(emb).collect()
    val byProbe = got.groupBy(_.getLong(0))
    assert(byProbe.size === 10 && byProbe.values.forall(_.length === 5))
    byProbe.values.foreach { rows =>
      val ordered = rows.sortBy(_.getInt(1))
      // rank 1 is the relevance winner: its rel_cos is the max
      assert(ordered.head.getDouble(3) ===
        rows.map(_.getDouble(3)).max)
      assert(rows.map(_.getLong(2)).distinct.length === 5)
    }
  }
}
