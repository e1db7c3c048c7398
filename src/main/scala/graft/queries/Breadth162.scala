package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-sixty-third wave — QUANTILE NORMALIZATION across sources:
  * replace each document's length with the POOLED corpus value at the
  * same within-source quantile, so every source's length distribution
  * becomes the pooled one (the bioinformatics array-normalization
  * trick, applied the way a data pipeline aligns heterogeneous crawl
  * feeds before mixing). A source of tweets and a source of books end
  * up length-comparable without touching their internal ordering.
  *
  *  - **q_quantile_norm**: the per-source audit — n, pre/post means,
  *    post min/max — proving the transform moved every source onto
  *    the pooled scale while preserving monotonicity.
  *  - **q_quantile_norm_map**: the mapping itself on the bounded
  *    doc_id < 100 slice (id, source, raw rank, target pooled rank,
  *    raw and normalized length) — the join evidence.
  *
  * Exact-parity discipline: within-source rank r (of n_s) maps to the
  * pooled order statistic at index ((r−1)·N) div n_s + 1 — pure
  * integer arithmetic (headroom r·N ≤ N² ≈ 2.5e9 at sf0.1, int64 to
  * N ≈ 3e9), identical div semantics both engines; means are exact
  * integer sums with ONE terminal division.
  *
  * Scale shape: two rank windows (global + per-source; documented
  * approx-quantile swap at 100 TB — the map form only needs the
  * pooled quantile TABLE at the chosen resolution, not a global
  * sort), then an equi-join on the computed target rank —
  * hash-partitioned on an integer key, no skew (ranks are unique).
  */
object Breadth162 {

  /** Per-doc normalized lengths (internal). */
  private[graft] def normalized(docs: DataFrame): DataFrame = {
    val wPool = Window.orderBy(col("n_chars").asc, col("doc_id").asc)
    val wSrc = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    val base = docs.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("__gr", row_number().over(wPool).cast("long"))
      .withColumn("__r", row_number().over(wSrc).cast("long"))
      .withColumn("__ns",
        count(lit(1)).over(Window.partitionBy(col("source"))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
    val pool = base.select(col("__gr").as("__tgt"),
      col("n_chars").as("norm_chars"))
    base
      .withColumn("__t", expr("((__r - 1) * __n) div __ns + 1"))
      .join(pool, col("__t") === col("__tgt"))
      .select(col("doc_id"), col("source"), col("__r").as("src_rank"),
        col("__t").as("pool_rank"), col("n_chars"), col("norm_chars"))
  }

  /** Per-source audit of the transform. */
  private[graft] def quantileNorm(docs: DataFrame): DataFrame =
    normalized(docs)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("__sr"),
        sum(col("norm_chars")).as("__sn"),
        min(col("norm_chars")).as("norm_min"),
        max(col("norm_chars")).as("norm_max"))
      .select(col("source"), col("n"),
        (col("__sr").cast("double") / col("n").cast("double"))
          .as("mean_raw"),
        (col("__sn").cast("double") / col("n").cast("double"))
          .as("mean_norm"),
        col("norm_min"), col("norm_max"))
      .orderBy(col("source").asc)

  /** The bounded mapping slice. */
  private[graft] def quantileNormMap(docs: DataFrame): DataFrame =
    normalized(docs)
      .filter(col("doc_id") < 100)
      .orderBy(col("doc_id").asc)

  val defs: Map[String, Q] = Map(
    "q_quantile_norm" -> ((s, dir) =>
      quantileNorm(Tables.documents(s, dir))),
    "q_quantile_norm_map" -> ((s, dir) =>
      quantileNormMap(Tables.documents(s, dir))))

  /** Normalized-lengths CTE chain (no leading WITH), shared. */
  private val NormSql: String =
    """base AS (
      |  SELECT doc_id, source, n_chars,
      |    CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
      |      AS gr,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS BIGINT) AS r,
      |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS ns,
      |    CAST(count(*) OVER () AS BIGINT) AS n
      |  FROM documents),
      |mapped AS (
      |  SELECT b.doc_id, b.source, b.r AS src_rank,
      |    ((b.r - 1) * b.n) // b.ns + 1 AS pool_rank,
      |    b.n_chars, p.n_chars AS norm_chars
      |  FROM base b JOIN base p ON ((b.r - 1) * b.n) // b.ns + 1 = p.gr)"""
      .stripMargin

  val oracle: Map[String, String] = Map(
    "q_quantile_norm" ->
      s"""WITH $NormSql
         |SELECT source, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS mean_raw,
         |  CAST(sum(norm_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS mean_norm,
         |  CAST(min(norm_chars) AS BIGINT) AS norm_min,
         |  CAST(max(norm_chars) AS BIGINT) AS norm_max
         |FROM mapped
         |GROUP BY source
         |ORDER BY source""".stripMargin,

    "q_quantile_norm_map" ->
      s"""WITH $NormSql
         |SELECT doc_id, source, src_rank, pool_rank, n_chars, norm_chars
         |FROM mapped
         |WHERE doc_id < 100
         |ORDER BY doc_id""".stripMargin)
}
