package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`ArrayType(FloatType)`).
  *
  *  - `cosine` is a pure Column expression (zip_with product + sequential
  *    aggregate fold) — whole-stage codegen, no UDF, and the fold order is
  *    left-to-right exactly like DuckDB's list loops, so doubles match the
  *    oracle bit-for-bit before rounding.
  *  - brute-force top-k: probes × corpus join; the PROBE side is the small
  *    side and is broadcast, the corpus streams — linear scan per probe,
  *    which is the correct baseline and the correctness oracle for ANN.
  *  - LSH ANN: random-hyperplane sign buckets; hyperplane weights are
  *    derived deterministically from md5 bits so every executor (and any
  *    re-run) builds identical planes with no driver-side RNG state.
  */
object Similarity {

  /** Elementwise dot product of two float-array columns, computed in
    * double, sequential fold order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine via built-in higher-order functions — the reference
    * formulation the custom expression must match bit-for-bit (asserted
    * in SimilaritySpec). Allocates a zipped array per row; use `cosine`. */
  def cosineFold(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** cosine(a,b) as a native codegen'd Catalyst expression: one primitive
    * loop, no intermediate array, same sequential double arithmetic
    * (graft.functions.CosineSimilarity). */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.CosineSimilarity(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))

  /** Brute-force cosine top-k: for each probe vector, the k nearest corpus
    * vectors (excluding itself when ids collide). Ranking uses the cosine
    * ROUNDED to 6 dp with the corpus id as tiebreaker, so the ordering is
    * reproducible across engines despite last-ulp float drift. */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = broadcast(p).crossJoin(c)
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("pv"), col("cv")), 6))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** All pairs (a<b) within `blockCol` whose cosine >= threshold — exact
    * all-pairs form. Quadratic in block size: retained as the ground
    * truth the LSH-prefiltered form is asserted against (SimilaritySpec)
    * and for corpora whose blocks are known-small. */
  def cosineNearDupPairsExact(emb: DataFrame, blockCol: String, threshold: Double,
                              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = emb.select(col(blockCol), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = emb.select(col(blockCol), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("va"), col("vb")), 6))
      .filter(col("cos") >= threshold)
      .select(col(blockCol), col("id_a"), col("id_b"), col("cos"))
  }

  /** Embedding-cosine near-dup pairs, LSH-prefiltered: candidates = pairs
    * sharing a sign-LSH bucket in ANY of `numTables` tables (within
    * `blockCol`), then exact-cosine verified >= threshold. A skewed block
    * costs Σ bucket² per table instead of block² — the 100× scale shape.
    *
    * Recall is probabilistic but engineered ≈ 1: a pair at cosine c
    * collides per plane with p = 1 − acos(c)/π, so the miss probability
    * is (1 − p^numPlanes)^numTables — for the defaults (2 planes,
    * 48 tables) that is < 2e-10 at c = 0.35 and vanishing at near-dup
    * thresholds c >= 0.8 (tables doubled from 24 after the round-2
    * advisor note: the oracle gate compares against EXACT all-pairs, so
    * per-pair miss probability is a parity-gate risk on future data, and
    * more tables only widen the ids-only explode, never the vectors);
    * planes are deterministic (splitmix-derived,
    * graft.functions.LshSignatures), so output is reproducible run to
    * run. Equality with the exact form on the testdata is pinned in
    * SimilaritySpec. */
  def cosineNearDupPairs(emb: DataFrame, blockCol: String, threshold: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         numPlanes: Int = 2, numTables: Int = 48): DataFrame = {
    // the exploded signature frame carries IDS ONLY — shipping the
    // vector through a numTables-way explode would multiply shuffle
    // width by tables × dim; vectors re-join onto the deduped candidate
    // pairs, each exactly once
    val sig = emb.select(col(blockCol), col(idCol),
      posexplode(lshSignatures(col(vecCol), numPlanes, numTables)).as(Seq("t", "bucket")))
    val a = sig.select(col(blockCol), col("t"), col("bucket"), col(idCol).as("id_a"))
    val b = sig.select(col(blockCol), col("t"), col("bucket"), col(idCol).as("id_b"))
    val cands = a.join(b, Seq(blockCol, "t", "bucket"))
      .filter(col("id_a") < col("id_b"))
      // a pair colliding in m tables surfaces m times
      .dropDuplicates("id_a", "id_b")
      .select(col(blockCol), col("id_a"), col("id_b"))
    val va = emb.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val vb = emb.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    cands.join(va, "id_a").join(vb, "id_b")
      .withColumn("cos", round(cosine(col("va"), col("vb")), 6))
      .filter(col("cos") >= threshold)
      .select(col(blockCol), col("id_a"), col("id_b"), col("cos"))
  }

  /** Per-probe ANN quality report against brute-force ground truth — the
    * shape that makes an ANN query ORACLE-CHECKABLE by an engine that
    * cannot reproduce the index: every column except `recall_ok` derives
    * from the exact brute-force ranking (independently computable in
    * SQL), and `recall_ok` asserts the recall BOUND (|ann ∩ true top-k|
    * >= minHits), which the oracle states as literal true — the
    * q_approx_distinct pattern. `brute` and `ann` carry (probe_id, rank,
    * neighbor_id, cos). The brute frame feeds two consumers (truth agg +
    * intersection) and is persisted; k-sized per probe, so the cache is
    * tiny by construction. */
  def recallReport(ann: DataFrame, brute: DataFrame, minHits: Int): DataFrame = {
    val b = brute.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val truth = b.groupBy(col("probe_id")).agg(
      count(lit(1)).as("n_true"),
      max(when(col("rank") === 1, col("neighbor_id"))).as("best_neighbor_id"),
      max(when(col("rank") === 1, col("cos"))).as("best_cos"))
    val hits = ann
      .join(b.select("probe_id", "neighbor_id"), Seq("probe_id", "neighbor_id"), "left_semi")
      .groupBy(col("probe_id")).agg(count(lit(1)).as("__n_hit"))
    truth.join(hits, Seq("probe_id"), "left_outer")
      .select(col("probe_id"), col("n_true"), col("best_neighbor_id"), col("best_cos"),
        (coalesce(col("__n_hit"), lit(0L)) >= minHits).as("recall_ok"))
  }

  /** Multi-table LSH signature column: array<long>, one sign-bucket per
    * table (native codegen expression, graft.functions.LshSignatures). */
  def lshSignatures(vecCol: Column, numPlanes: Int, numTables: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.LshSignatures(
        org.apache.spark.sql.graft.Bridge.expression(vecCol), numPlanes, numTables))

  /** ANN top-k via multi-table random-hyperplane LSH: `numTables`
    * independent sign-bucket tables; candidates = corpus vectors sharing
    * the probe's bucket in ANY table (standard OR-amplification — one
    * table's recall is too low at useful bucket sizes), deduped, then
    * ranked by exact cosine.
    *
    * The scale path: each (table, bucket) key co-partitions the join, so
    * a probe touches ~numTables × |corpus| / 2^numPlanes candidates
    * instead of |corpus|. Recall vs `bruteForceTopK` is asserted in the
    * test suite. */
  def lshTopK(probes: DataFrame, corpus: DataFrame, k: Int,
              numPlanes: Int = 4, numTables: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def withBuckets(df: DataFrame, id: String, v: String) =
      df.select(col(idCol).as(id), col(vecCol).as(v),
          posexplode(lshSignatures(col(vecCol), numPlanes, numTables))
            .as(Seq("t", "bucket")))
    val p = withBuckets(probes, "probe_id", "pv")
    val c = withBuckets(corpus, "neighbor_id", "cv")
    val cands = broadcast(p).join(c, Seq("t", "bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select("probe_id", "pv", "neighbor_id", "cv")
      .dropDuplicates("probe_id", "neighbor_id")
    val scored = cands.withColumn("cos", round(cosine(col("pv"), col("cv")), 6))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
