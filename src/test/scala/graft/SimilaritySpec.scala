package graft

import graft.Tables
import graft.sim.{Ivf, Similarity}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native CosineSimilarity expression is bit-identical to the " +
    "zip_with/aggregate fold on real embeddings") {
    val emb = Tables.embeddings(spark, sf0001).limit(50)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
    val diffs = pairs.select(
        Similarity.cosine(col("va"), col("vb")).as("native"),
        Similarity.cosineFold(col("va"), col("vb")).as("fold"))
      .filter(col("native") =!= col("fold")) // bitwise: no tolerance
      .count()
    assert(diffs == 0)
  }

  test("cosine: identical vectors → 1, orthogonal → 0, opposite → -1") {
    val df = Seq(
      (1L, Seq(1f, 0f), Seq(1f, 0f)),
      (2L, Seq(1f, 0f), Seq(0f, 1f)),
      (3L, Seq(1f, 2f), Seq(-1f, -2f))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), round(Similarity.cosine(col("a"), col("b")), 9).as("c"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 1.0)
    assert(out(2L) == 0.0)
    assert(out(3L) == -1.0)
  }

  test("brute-force top-k ranks the nearest corpus vector first") {
    val corpus = Seq(
      (10L, Seq(1f, 0f, 0f)), (11L, Seq(0.9f, 0.1f, 0f)),
      (12L, Seq(0f, 1f, 0f)), (13L, Seq(0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val probes = Seq((1L, Seq(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(probes, corpus, 2)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toMap
    assert(out(1) == 10L)
    assert(out(2) == 11L)
  }

  test("IVF ANN achieves recall >= 0.5 vs brute force on real embeddings") {
    val emb = Tables.embeddings(spark, sf0001)
    val probes = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(probes, emb, 5)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val centroids = Ivf.trainCentroids(emb, k = 16, iters = 2)
    val index = Ivf.buildIndex(emb, centroids)
    val approx = Ivf.ivfTopK(probes, index, centroids, nProbe = 4, k = 5)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("LSH ANN achieves recall >= 0.6 vs brute force on real embeddings") {
    val emb = Tables.embeddings(spark, sf0001)
    val probes = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(probes, emb, 5)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(probes, emb, k = 5,
        numPlanes = 4, numTables = 8)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
  }
}
