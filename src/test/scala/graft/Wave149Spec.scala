package graft

import graft.queries.{Breadth101, Breadth141}
import graft.sim.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-forty-second wave (Breadth141 global
  * mutual-kNN modularity). */
class Wave149Spec extends SparkSpec {
  import spark.implicits._

  private def pad(v: Seq[Float]): Array[Float] =
    (v ++ Seq.fill(64 - v.length)(0.0f)).toArray

  test("global IVF-pruned kNN build equals the label-blind all-pairs " +
    "build exactly at sf0.001 (recall 1.0)") {
    val emb = Tables.embeddings(spark, sf0001)
    val ivf = Breadth141.globalKnnDirected(emb)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = emb.select(col("vec_id").as("src"), col("embedding").as("__va"))
    val b = emb.select(col("vec_id").as("dst"), col("embedding").as("__vb"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cos").desc, col("dst").asc)
    val exact = a.crossJoin(b)
      .filter(col("src") =!= col("dst"))
      .withColumn("cos",
        round(Similarity.cosine(col("__va"), col("__vb")), 6))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= Breadth141.GlobalKnnK)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == exact)
  }

  test("complete mutual graph of two 2-node labels has Q = -1/6") {
    // 4 nodes, k=4: every pair is mutual -> m = 6, each label
    // e_in = 1, d_tot = 6; Q = sum(4*6*1 - 36) / 144 = -24/144
    val emb = Seq(
      (1L, pad(Seq(1.0f, 0.0f)), 0), (2L, pad(Seq(0.9f, 0.1f)), 0),
      (3L, pad(Seq(0.0f, 1.0f)), 1), (4L, pad(Seq(0.1f, 0.9f)), 1))
      .toDF("vec_id", "embedding", "label")
    val edges = Breadth141.globalMutualEdges(emb)
    assert(edges.count() == 6L)
    val got = Breadth141.modularity(emb, edges).collect().head
    assert(got.getAs[Long]("m_edges") == 6L)
    assert(got.getAs[Double]("q_modularity") == -24.0 / 144.0)
  }

  test("two well-separated clusters score positive modularity and " +
    "all edges stay internal") {
    val a = (1L to 6L).map(i =>
      (i, pad(Seq(1.0f, 0.01f * i, 0.0f)), 0))
    val b = (11L to 16L).map(i =>
      (i, pad(Seq(0.0f, 0.01f * i, 1.0f)), 1))
    val emb = (a ++ b).toDF("vec_id", "embedding", "label")
    val edges = Breadth141.globalMutualEdges(emb)
    val coh = Breadth141.labelCohesion(emb, edges).collect()
    assert(coh.map(_.getAs[Double]("frac_in")).sum == 1.0,
      "no cross-cluster mutual edges")
    val q = Breadth141.modularity(emb, edges).collect().head
      .getAs[Double]("q_modularity")
    assert(q > 0.3, s"clustered corpus must score high modularity: $q")
  }

  test("sf0.001: modularity equals the sum of per-label contributions " +
    "and the cohesion table is internally consistent") {
    val emb = Tables.embeddings(spark, sf0001)
    val edges = Breadth141.globalMutualEdges(emb)
      .localCheckpoint(eager = true)
    val q = Breadth141.modularity(emb, edges).collect().head
    val coh = Breadth141.labelCohesion(emb, edges).collect()
    assert(coh.length == 10)
    val qSum = coh.map(_.getAs[Double]("q_contrib")).sum
    assert(math.abs(q.getAs[Double]("q_modularity") - qSum) < 1e-9)
    coh.foreach { r =>
      assert(math.abs(r.getAs[Double]("q_contrib")
        - (r.getAs[Double]("frac_in") - r.getAs[Double]("frac_expected")))
        < 1e-12)
    }
    assert(coh.map(_.getAs[Long]("d_tot")).sum ==
      2 * q.getAs[Long]("m_edges"))
  }
}
