package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-fiftieth wave — NEYMAN ALLOCATION: the optimal stratified
  * sampling design (allocate a labeling/eval budget across strata
  * ∝ N_h·S_h) with exact integer largest-remainder rounding, plus the
  * closed-form efficiency audit against proportional allocation —
  * the "where do my 100 human labels go" planner of a data-quality
  * pipeline.
  *
  * Exact-parity construction: per-stratum (source) moments of n_chars
  * are integers (n, Σx, Σx²); the population-variance NUMERATOR
  * varnum = n·Σx² − (Σx)² is exact int64; N_h·S_h = √varnum — one
  * IEEE-correctly-rounded sqrt (bit-equal cross-engine), quantized to
  * 1e-6 units. The allocation is then PURE INTEGER ARITHMETIC:
  * a_h = (B·wq_h) div Σwq plus largest-remainder top-up ranked by the
  * integer remainder (B·wq_h) mod Σwq (ties source-ascending) — no
  * double ever decides a unit, and Σa_h = B by construction.
  * Int64 headroom: varnum ≤ n²·max(x)² wraps past n ≈ 5e6 rows per
  * stratum at x ≤ 600 (rescale x div 10, the documented knob);
  * B·wq ≤ B·1e6·√varnum stays ≤ 2.2e12.
  *
  * Scale shape: ONE hash aggregate to |strata| moment rows, a
  * |strata|-row window for the remainder rank, one broadcast of the
  * weight total. Nothing touches row-level data twice.
  */
object Breadth149 {

  private[graft] val Budget = 100L

  /** Per-stratum moments + quantized Neyman weight. */
  private[graft] def strataWeights(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_h"),
        sum(col("n_chars")).as("__sx"),
        sum(col("n_chars") * col("n_chars")).as("__sxx"))
      .select(col("source"), col("n_h"),
        (col("n_h") * col("__sxx") - col("__sx") * col("__sx"))
          .as("var_num"))
      .withColumn("weight_q",
        floor(sqrt(col("var_num").cast("double")) * lit(1.0e6) + lit(0.5))
          .cast("long"))

  /** The allocation table: source, n_h, var_num, weight_q, alloc. */
  private[graft] def neyman(docs: DataFrame,
                            budget: Long = Budget): DataFrame = {
    val w = strataWeights(docs)
    val tot = w.agg(sum(col("weight_q")).as("__wsum"),
      count(lit(1)).as("__k"))
    val based = w.crossJoin(broadcast(tot))
      .withColumn("__a0", expr(s"($budget * weight_q) div __wsum"))
      .withColumn("__rem", expr(s"($budget * weight_q) % __wsum"))
    val leftover = based.agg((lit(budget) - sum(col("__a0"))).as("__l"))
    based.crossJoin(broadcast(leftover))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__rem").desc, col("source").asc)).cast("long"))
      .select(col("source"), col("n_h"), col("var_num"), col("weight_q"),
        (col("__a0") + when(col("__rk") <= col("__l"), 1L).otherwise(0L))
          .as("alloc"))
      .orderBy(col("source").asc)
  }

  /** Closed-form (continuous) design variances: proportional vs
    * Neyman, and the efficiency ratio (≥ 1 by Cauchy–Schwarz). */
  private[graft] def neymanEfficiency(docs: DataFrame,
                                      budget: Long = Budget): DataFrame = {
    val w = strataWeights(docs)
      .withColumn("__vq",
        floor(col("var_num").cast("double") / col("n_h").cast("double")
          * lit(1.0e6) + lit(0.5)).cast("long"))
    w.agg(sum(col("n_h")).as("__n"), sum(col("weight_q")).as("__ws"),
        sum(col("__vq")).as("__sq"), count(lit(1)).as("n_strata"))
      .select(col("__n").as("n_docs"), col("n_strata"),
        ((col("__n").cast("double") / lit(budget.toDouble))
          * (col("__sq").cast("double") / lit(1.0e6))).as("var_prop"),
        (((col("__ws").cast("double") / lit(1.0e6))
          * (col("__ws").cast("double") / lit(1.0e6)))
          / lit(budget.toDouble)).as("var_neyman"))
      .withColumn("efficiency", col("var_prop") / col("var_neyman"))
  }

  val defs: Map[String, Q] = Map(
    "q_neyman" -> ((s, dir) => neyman(Tables.documents(s, dir))),
    "q_neyman_efficiency" -> ((s, dir) =>
      neymanEfficiency(Tables.documents(s, dir))))

  /** Moment + weight CTE chain (no leading WITH), shared. */
  private val WSql: String =
    s"""mo AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_h,
       |    CAST(sum(n_chars) AS BIGINT) AS sx,
       |    CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
       |  FROM documents GROUP BY source),
       |wt AS (
       |  SELECT source, n_h, n_h * sxx - sx * sx AS var_num,
       |    CAST(floor(sqrt(CAST(n_h * sxx - sx * sx AS DOUBLE)) * 1.0e6
       |      + 0.5) AS BIGINT) AS weight_q
       |  FROM mo)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_neyman" ->
      s"""WITH $WSql,
         |tt AS (SELECT CAST(sum(weight_q) AS BIGINT) AS wsum FROM wt),
         |ba AS (
         |  SELECT w.source, w.n_h, w.var_num, w.weight_q,
         |    ($Budget * w.weight_q) // t.wsum AS a0,
         |    ($Budget * w.weight_q) % t.wsum AS rem
         |  FROM wt w CROSS JOIN tt t),
         |lo AS (SELECT $Budget - CAST(sum(a0) AS BIGINT) AS l FROM ba)
         |SELECT b.source, b.n_h, b.var_num, b.weight_q,
         |  CAST(b.a0 + CASE WHEN row_number() OVER (
         |      ORDER BY b.rem DESC, b.source) <= lo.l
         |    THEN 1 ELSE 0 END AS BIGINT) AS alloc
         |FROM ba b CROSS JOIN lo
         |ORDER BY b.source""".stripMargin,

    "q_neyman_efficiency" ->
      s"""WITH $WSql,
         |vq AS (
         |  SELECT n_h, weight_q,
         |    CAST(floor(CAST(var_num AS DOUBLE) / CAST(n_h AS DOUBLE)
         |      * 1.0e6 + 0.5) AS BIGINT) AS v
         |  FROM wt)
         |SELECT CAST(sum(n_h) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_strata,
         |  (CAST(sum(n_h) AS DOUBLE) / ${Budget.toDouble})
         |    * (CAST(sum(v) AS DOUBLE) / 1.0e6) AS var_prop,
         |  ((CAST(sum(weight_q) AS DOUBLE) / 1.0e6)
         |    * (CAST(sum(weight_q) AS DOUBLE) / 1.0e6))
         |    / ${Budget.toDouble} AS var_neyman,
         |  ((CAST(sum(n_h) AS DOUBLE) / ${Budget.toDouble})
         |    * (CAST(sum(v) AS DOUBLE) / 1.0e6))
         |   / (((CAST(sum(weight_q) AS DOUBLE) / 1.0e6)
         |    * (CAST(sum(weight_q) AS DOUBLE) / 1.0e6))
         |    / ${Budget.toDouble}) AS efficiency
         |FROM vq""".stripMargin)
}
