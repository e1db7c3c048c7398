package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ninety-second wave — corpus-level embedding diagnostics.
  *
  * Mean vectors are the classic float trap: a distributed component
  * sum of floats is partition-order-dependent. The whole wave runs on
  * 1e-6-quantized integer components instead — map-side-combinable
  * int64 sums per (label, dim), exact on any partitioning — and every
  * emitted float is one closed-form expression over those integers.
  *
  *  - **q_label_centroids**: the per-label centroid table (label, dim,
  *    exact component sum, mean) — the broadcast-side input every
  *    centroid-based curation step (IVF coarse cells, semantic dedup
  *    buckets, DSIR anchors) starts from.
  *  - **q_centroid_sim**: the inter-label centroid cosine matrix —
  *    cosine is scale-invariant, so the quantized SUMS stand in for
  *    means with no division; dot/norm products run in decimal38
  *    (64·(5e8)² clears int64), one sqrt-ratio at emit, 6-dp.
  *  - **q_norm_hist**: per-label vector-norm histogram in 0.1-wide
  *    buckets — per-row exact ‖v‖² integers, one identical
  *    sqrt+floor per row on both engines (no sums of floats anywhere).
  *
  * Scale shape: one posexplode of the embedding column feeds
  * everything; (label, dim) sums combine map-side to |labels|·|dims|
  * rows; the pair matrix is |labels|²/2 over that aggregate. */
object Breadth91 {

  private[graft] val QScale = 1000000L

  /** (label, vec_id, dim, quantized component) exploded view. */
  private def quantized(emb: DataFrame): DataFrame =
    emb.select(col("label"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("dim", "__x")))
      .withColumn("__xq",
        floor(col("__x").cast("double") * lit(QScale.toDouble) + lit(0.5))
          .cast("long"))

  /** Exact per-label centroid component table. */
  private[graft] def labelCentroids(emb: DataFrame): DataFrame =
    quantized(emb)
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("__xq")).as("sum_q"))
      .select(col("label"), col("dim").cast("long").as("dim"),
        col("n_vecs"), col("sum_q"),
        (col("sum_q").cast("double") /
          (col("n_vecs").cast("double") * lit(QScale.toDouble)))
          .as("mean_component"))
      .orderBy(col("label").asc, col("dim").asc)

  /** Inter-label centroid cosine matrix from exact integer sums. */
  private[graft] def centroidSim(emb: DataFrame): DataFrame = {
    val c = quantized(emb).groupBy(col("label"), col("dim"))
      .agg(sum(col("__xq")).as("__s"))
    val norms = c.groupBy(col("label"))
      .agg(sum(col("__s").cast("decimal(38,0)") *
        col("__s").cast("decimal(38,0)")).as("__nn"))
    val dots = c.select(col("label").as("label_a"), col("dim"),
        col("__s").as("__sa"))
      .join(c.select(col("label").as("label_b"), col("dim"),
        col("__s").as("__sb")), Seq("dim"))
      .filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(col("__sa").cast("decimal(38,0)") *
        col("__sb").cast("decimal(38,0)")).as("__dot"))
    dots
      .join(norms.select(col("label").as("label_a"),
        col("__nn").as("__na")), "label_a")
      .join(norms.select(col("label").as("label_b"),
        col("__nn").as("__nb")), "label_b")
      .select(col("label_a"), col("label_b"),
        when(col("__na") > 0 && col("__nb") > 0,
          round(col("__dot").cast("double") /
            (sqrt(col("__na").cast("double")) *
              sqrt(col("__nb").cast("double"))), 6)).as("centroid_cos"))
      .orderBy(col("label_a").asc, col("label_b").asc)
  }

  /** Per-label norm histogram, 0.1-wide buckets. */
  private[graft] def normHist(emb: DataFrame): DataFrame =
    quantized(emb)
      .groupBy(col("label"), col("vec_id"))
      .agg(sum(col("__xq") * col("__xq")).as("__ssq"))
      .withColumn("__bucket",
        floor(sqrt(col("__ssq").cast("double")) / lit(100000.0))
          .cast("long"))
      .groupBy(col("label"), col("__bucket"))
      .agg(count(lit(1)).as("n_vecs"))
      .select(col("label"),
        (col("__bucket").cast("double") / lit(10.0)).as("norm_lo"),
        col("n_vecs"))
      .orderBy(col("label").asc, col("norm_lo").asc)

  val defs: Map[String, Q] = Map(
    "q_label_centroids" -> ((s, dir) =>
      labelCentroids(Tables.embeddings(s, dir))),
    "q_centroid_sim" -> ((s, dir) => centroidSim(Tables.embeddings(s, dir))),
    "q_norm_hist" -> ((s, dir) => normHist(Tables.embeddings(s, dir))))

  private val qSql =
    s"""q AS (
       |  SELECT label, vec_id, dim, CAST(floor(x * $QScale.0 + 0.5)
       |      AS BIGINT) AS xq
       |  FROM (
       |    SELECT label, vec_id,
       |      unnest(CAST(embedding AS DOUBLE[])) AS x,
       |      unnest(range(0, len(embedding))) AS dim
       |    FROM embeddings))""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_label_centroids" ->
      s"""WITH $qSql
         |SELECT label, CAST(dim AS BIGINT) AS dim,
         |  CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(sum(xq) AS BIGINT) AS sum_q,
         |  CAST(CAST(sum(xq) AS BIGINT) AS DOUBLE)
         |    / (CAST(count(*) AS DOUBLE) * $QScale.0) AS mean_component
         |FROM q GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_centroid_sim" ->
      s"""WITH $qSql,
         |c AS (SELECT label, dim, CAST(sum(xq) AS BIGINT) AS s
         |  FROM q GROUP BY 1, 2),
         |norms AS (SELECT label,
         |    sum(CAST(s AS HUGEINT) * s) AS nn
         |  FROM c GROUP BY 1),
         |dots AS (
         |  SELECT a.label AS label_a, b.label AS label_b,
         |    sum(CAST(a.s AS HUGEINT) * b.s) AS dot
         |  FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
         |  GROUP BY 1, 2)
         |SELECT label_a, label_b,
         |  CASE WHEN na.nn > 0 AND nb.nn > 0 THEN
         |    round(CAST(dot AS DOUBLE)
         |      / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))),
         |      6)
         |  END AS centroid_cos
         |FROM dots
         |JOIN norms na ON label_a = na.label
         |JOIN norms nb ON label_b = nb.label
         |ORDER BY label_a, label_b""".stripMargin,

    "q_norm_hist" ->
      s"""WITH $qSql,
         |ssq AS (SELECT label, vec_id, CAST(sum(xq * xq) AS BIGINT) AS s
         |  FROM q GROUP BY 1, 2),
         |b AS (SELECT label,
         |    CAST(floor(sqrt(CAST(s AS DOUBLE)) / 100000.0) AS BIGINT)
         |      AS bucket
         |  FROM ssq)
         |SELECT label, CAST(bucket AS DOUBLE) / 10.0 AS norm_lo,
         |  CAST(count(*) AS BIGINT) AS n_vecs
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
