package graft.queries

import graft.Tables
import graft.sim.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-fifty-seventh wave — kNN-SHAPLEY DATA VALUATION: the exact
  * closed-form Shapley value of every training vector for a K=5
  * nearest-neighbor classifier over a fixed probe set (Jia et al.'s
  * efficient exact recursion: sort the corpus by distance to the probe;
  * the farthest point's value is 1[match]/N and each nearer point adds
  * (1[match_i]−1[match_{i+1}])·min(K,i)/(K·i) — a SUFFIX SCAN, no 2^N
  * coalitions). The north-star use: rank which training examples help
  * or hurt a retrieval-classifier, before paying to keep them.
  *
  * Exact-parity discipline: cosine ranks use the shared 6-dp-rounded
  * fold with train-id tiebreak (deterministic total order across
  * engines); every Shapley term is quantized to integer 1e-12 units
  * with truncating division (Spark `div` == DuckDB `//` toward zero,
  * including negative numerators), and the per-point value is an
  * order-free SUM of those BIGINT terms — no float accumulation
  * anywhere. Int64 headroom: |term| ≤ 1e12, suffix sums ≤ N·1e12 and
  * label sums ≤ |probes|·1e12 ≈ 2e13 — overflow needs N ≈ 9·10⁶ rows
  * PER PROBE PARTITION before the suffix sum wraps.
  *
  * Scale shape: the probe set is FIXED (20 vectors), so the pair table
  * is 20·N rows — linear in the corpus, one window sort per probe
  * partition. At 100 TB the documented knob is the paper's truncated
  * variant: contributions decay as min(K,j)/j, so cut the scan at rank
  * horizon J and Monte-Carlo the tail (error ≤ Σ_{j>J} 1/j per sign
  * alternation); the gate-SF build keeps the full exact scan as the
  * oracle twin.
  */
object Breadth156 {

  private[graft] val K = 5
  private[graft] val ProbeMax = 20L
  private[graft] val Scale = 1000000000000L // 1e12 units per 1.0
  private[graft] val TopN = 10

  /** Per (probe, train) exact scaled Shapley values (internal). */
  private[graft] def shapleyPairs(emb: DataFrame): DataFrame = {
    val probes = emb.filter(col("vec_id") < ProbeMax)
      .select(col("vec_id").as("probe_id"), col("embedding").as("__pv"),
        col("label").as("__plabel"))
    val train = emb.select(col("vec_id").as("train_id"),
      col("embedding").as("__tv"), col("label").as("train_label"))
    val scored = broadcast(probes).crossJoin(train)
      .filter(col("train_id") =!= col("probe_id"))
      .select(col("probe_id"), col("train_id"), col("train_label"),
        when(col("train_label") === col("__plabel"), lit(1L))
          .otherwise(lit(0L)).as("agree"),
        round(Similarity.cosine(col("__pv"), col("__tv")), 6).as("__cos"))
    // every window shares ONE partitioning + ordering (cos DESC,
    // train_id ASC == rnk ASC), so Spark plans a single shuffle+sort
    // and the later window passes reuse the child ordering — measured
    // at sf1: the three-spec form resorted the 20·N pair table per
    // window and ran 33× at 10× rows; the shared-spec form is the
    // n·log n it should be
    val byDist = Window.partitionBy(col("probe_id"))
      .orderBy(col("__cos").desc, col("train_id").asc)
    val full = byDist.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = scored
      .withColumn("rnk", row_number().over(byDist).cast("long"))
      .withColumn("__n", count(lit(1)).over(full))
      .withColumn("__lead", lead(col("agree"), 1).over(byDist))
    // Per-rank contribution c_j in 1e-12 units; the farthest rank
    // carries the 1[match]/N base term instead of a delta.
    val contrib = ranked.withColumn("__c",
      when(col("rnk") < col("__n"),
        expr(s"((agree - __lead) * least($K, rnk) * $Scale) div ($K * rnk)"))
        .otherwise(expr(s"(agree * $Scale) div __n")))
    // suffix_sum(c) as total − exclusive-prefix: Spark evaluates a
    // (currentRow, unboundedFollowing) frame by RESCANNING the tail per
    // row — O(n²) per partition, measured 81 s at 20k rows/probe — while
    // the running-prefix and once-per-partition full frames are O(n).
    // Integer arithmetic, so the rewrite is exactly equal.
    val run = byDist.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    contrib
      .withColumn("__run", sum(col("__c")).over(run))
      .withColumn("__tot", sum(col("__c")).over(full))
      .withColumn("shapley_1e12",
        col("__tot") - col("__run") + col("__c"))
      .select(col("probe_id"), col("train_id"), col("train_label"),
        col("agree"), col("rnk"), col("shapley_1e12"))
  }

  /** Top-10 most valuable training vectors per probe. */
  private[graft] def knnShapley(emb: DataFrame): DataFrame = {
    val byValue = Window.partitionBy(col("probe_id"))
      .orderBy(col("shapley_1e12").desc, col("train_id").asc)
    shapleyPairs(emb)
      .withColumn("value_rank", row_number().over(byValue).cast("long"))
      .filter(col("value_rank") <= TopN)
      .select(col("probe_id"), col("value_rank"), col("train_id"),
        col("train_label"), col("agree"), col("shapley_1e12"))
      .orderBy(col("probe_id").asc, col("value_rank").asc)
  }

  /** Aggregate valuation per training label: is a class's data worth
    * keeping for these probes? */
  private[graft] def shapleyByLabel(emb: DataFrame): DataFrame =
    shapleyPairs(emb)
      .groupBy(col("train_label").as("label"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("shapley_1e12")).as("sum_shapley_1e12"))
      .select(col("label"), col("n_pairs"), col("sum_shapley_1e12"),
        (col("sum_shapley_1e12").cast("double") /
          (col("n_pairs") * lit(Scale)).cast("double")).as("mean_shapley"))
      .orderBy(col("label").asc)

  val defs: Map[String, Q] = Map(
    "q_knn_shapley" -> ((s, dir) => knnShapley(Tables.embeddings(s, dir))),
    "q_shapley_by_label" -> ((s, dir) =>
      shapleyByLabel(Tables.embeddings(s, dir))))

  /** Shared CTE chain (no leading WITH). */
  private val PairSql: String =
    s"""probes AS (
       |  SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv,
       |    label AS plabel
       |  FROM embeddings WHERE vec_id < $ProbeMax),
       |train AS (
       |  SELECT vec_id AS train_id, CAST(embedding AS DOUBLE[]) AS tv,
       |    label AS train_label
       |  FROM embeddings),
       |scored AS (
       |  SELECT p.probe_id, t.train_id, t.train_label,
       |    CASE WHEN t.train_label = p.plabel
       |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS agree,
       |    round(list_dot_product(p.pv, t.tv)
       |      / (sqrt(list_dot_product(p.pv, p.pv))
       |        * sqrt(list_dot_product(t.tv, t.tv))), 6) AS cos
       |  FROM probes p JOIN train t ON t.train_id <> p.probe_id),
       |ranked AS (
       |  SELECT probe_id, train_id, train_label, agree,
       |    CAST(row_number() OVER (PARTITION BY probe_id
       |      ORDER BY cos DESC, train_id) AS BIGINT) AS rnk,
       |    CAST(count(*) OVER (PARTITION BY probe_id) AS BIGINT) AS n
       |  FROM scored),
       |contrib AS (
       |  SELECT probe_id, train_id, train_label, agree, rnk,
       |    CASE WHEN rnk < n THEN
       |      ((agree - lead(agree) OVER (PARTITION BY probe_id
       |          ORDER BY rnk)) * least($K, rnk) * $Scale) // ($K * rnk)
       |    ELSE (agree * $Scale) // n END AS c
       |  FROM ranked),
       |vals AS (
       |  SELECT probe_id, train_id, train_label, agree,
       |    CAST(sum(c) OVER (PARTITION BY probe_id ORDER BY rnk
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       |      AS BIGINT) AS shapley_1e12
       |  FROM contrib)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_knn_shapley" ->
      s"""WITH $PairSql
         |SELECT probe_id, value_rank, train_id, train_label, agree,
         |  shapley_1e12
         |FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY shapley_1e12 DESC, train_id) AS BIGINT) AS value_rank
         |  FROM vals) t
         |WHERE value_rank <= $TopN
         |ORDER BY probe_id, value_rank""".stripMargin,

    "q_shapley_by_label" ->
      s"""WITH $PairSql
         |SELECT train_label AS label, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(shapley_1e12) AS BIGINT) AS sum_shapley_1e12,
         |  CAST(sum(shapley_1e12) AS DOUBLE)
         |    / CAST(count(*) * $Scale AS DOUBLE) AS mean_shapley
         |FROM vals
         |GROUP BY train_label
         |ORDER BY label""".stripMargin)
}
