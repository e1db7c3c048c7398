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

  test("LSH-prefiltered near-dup pairs == exact all-pairs on real " +
    "embeddings at the tested threshold (recall 1.0)") {
    val emb = Tables.embeddings(spark, sf0001)
    val exact = Similarity.cosineNearDupPairsExact(emb, "label", 0.35)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect().toSet
    val lsh = Similarity.cosineNearDupPairs(emb, "label", 0.35)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty, "fixture must produce qualifying pairs")
    assert(lsh == exact, s"missed=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("cosine / lsh_signatures propagate null on a null array slot " +
    "instead of folding an undefined value") {
    val df = Seq(1).toDF("i").select(
      array(lit(1.0f), lit(null.asInstanceOf[java.lang.Float]), lit(3.0f)).as("withNull"),
      array(lit(1.0f), lit(2.0f), lit(3.0f)).as("clean"))
    val out = df.select(
      Similarity.cosine(col("withNull"), col("clean")).as("c1"),
      Similarity.cosine(col("clean"), col("clean")).as("c2"),
      Similarity.lshSignatures(col("withNull"), 2, 2).as("s1"),
      Similarity.lshSignatures(col("clean"), 2, 2).as("s2")).head()
    assert(out.isNullAt(0), "cosine over a null slot must be null")
    assert(!out.isNullAt(1))
    assert(out.isNullAt(2), "lsh signature over a null slot must be null")
    assert(!out.isNullAt(3))
  }

  test("LSH prefilter equals exact all-pairs on synthetic clustered " +
    "vectors at a near-dup threshold (0.9), where the miss bound is " +
    "strongest") {
    // 20 clusters of 4 near-identical vectors (tiny deterministic
    // perturbations) + noise dims — every within-cluster pair has cosine
    // ~0.99; cross-cluster pairs are near-orthogonal
    val dim = 16
    val rows = (0 until 20).flatMap { c =>
      (0 until 4).map { j =>
        val v = Array.tabulate(dim)(d =>
          (if (d == c % dim) 10f else 0.1f * ((c * 7 + d) % 5)) +
            0.01f * ((j * 13 + d) % 3))
        ((c * 4 + j).toLong, v.toSeq, s"g${c % 3}")
      }
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val exact = Similarity.cosineNearDupPairsExact(emb, "label", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosineNearDupPairs(emb, "label", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(lsh == exact, s"missed=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("multimodal features flow into ANN search end to end " +
    "(extract → index → top-k)") {
    import graft.multimodal.Multimodal
    // payloads repeat every 100 ids → feature vectors repeat too; the
    // nearest neighbor of any probe must be its payload twin
    val media = Multimodal.syntheticMedia(spark, 200)
    val feats = Multimodal.extractFeatures(media)
      .withColumnRenamed("media_id", "vec_id")
      .withColumnRenamed("features", "embedding")
    val probes = feats.filter(col("vec_id") < 5)
    val out = Similarity.bruteForceTopK(probes, feats, k = 1)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { id =>
      assert(out(id) == id + 100L,
        s"probe $id's nearest must be its payload twin, got ${out(id)}")
    }
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
