package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hundred-seventy-seventh wave — the DIFFERENTIAL-PRIVACY release,
  * closing the governance tier (k-anonymity, l-diversity, t-closeness
  * audit the RAW release; DP is what you ship when the audit fails):
  * the (source × lang) count histogram with Laplace(1/ε) noise,
  * ε = 0.5, sensitivity 1.
  *
  *  - **q_dp_histogram**: per cell — true count (the gate-SF audit
  *    view; a production release drops this column, documented),
  *    the noise draw, and the released noisy count.
  *  - **q_dp_utility**: the accountant's one-row summary — ε, cell
  *    count, mean/max absolute error, and the share of cells whose
  *    released count is off by more than 5.
  *
  * Exact-parity discipline: the noise is the DETERMINISTIC inverse-
  * CDF transform of the house md5 split-hash — u = h₆₀/2⁶⁰,
  * L = −(1/ε)·sign(u−½)·ln(1 − 2|u−½|) — replayable noise, the same
  * device as the engine's md5 bootstrap/permutation tiers (real
  * deployments swap in a CSPRNG; the QUERY SHAPE — one map over the
  * aggregate, noise keyed by cell identity — is what's under test).
  * The ln is rounded 6 dp (libm rule); everything downstream is
  * arithmetic on exactly-agreed doubles; mean-|error| quantizes per-
  * cell terms to 1e-6 units before the order-free BIGINT sum.
  *
  * Scale shape: one hash aggregate to the cell grid, then map-only
  * noise — the DP step adds ZERO shuffles; the utility audit is one
  * aggregate over the metadata-sized grid.
  */
object Breadth176 {

  private[graft] val InvEps = 2.0 // 1/epsilon, epsilon = 0.5
  private[graft] val Pow60 = 1152921504606846976L // 2^60

  /** Cells + deterministic Laplace noise (internal). */
  private[graft] def noisyCells(docs: DataFrame): DataFrame = {
    val cells = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
    val u = conv(substring(md5(concat(lit("dp#"), col("source"),
      lit("#"), col("lang"))), 1, 15), 16, 10).cast("long")
      .cast("double") / lit(Pow60.toDouble)
    cells
      .withColumn("__u", u)
      .withColumn("__sign",
        when(col("__u") >= 0.5, lit(1.0)).otherwise(lit(-1.0)))
      // greatest(·, 2⁻⁶⁰) guards the inverse-CDF's log(0): a cell whose
      // 60-bit draw lands exactly on 0 would otherwise release an
      // infinite noisy_count (probability 2⁻⁶⁰ per cell — never hit on
      // test data, so the clamp is hash-neutral; mirrored in DpSql)
      .withColumn("noise",
        lit(-InvEps) * col("__sign") *
          round(log(greatest(
            lit(1.0) - lit(2.0) * abs(col("__u") - lit(0.5)),
            lit(1.0 / Pow60.toDouble))), 6))
      .withColumn("noisy_count", col("n").cast("double") + col("noise"))
      .select(col("source"), col("lang"), col("n"), col("noise"),
        col("noisy_count"))
  }

  private[graft] def dpHistogram(docs: DataFrame): DataFrame =
    noisyCells(docs).orderBy(col("source").asc, col("lang").asc)

  /** Utility accountant. */
  private[graft] def dpUtility(docs: DataFrame): DataFrame =
    noisyCells(docs)
      .select(abs(col("noise")).as("__ae"))
      .agg(count(lit(1)).as("n_cells"),
        sum(floor(col("__ae") * lit(1.0e6) + lit(0.5)).cast("long"))
          .as("__sae"),
        max(col("__ae")).as("max_abs_err"),
        sum(when(col("__ae") > 5.0, 1L).otherwise(0L)).as("__big"))
      .select(lit(1.0 / InvEps).as("eps"), col("n_cells"),
        (col("__sae").cast("double") /
          (col("n_cells") * lit(1000000L)).cast("double"))
          .as("mean_abs_err"),
        col("max_abs_err"),
        (col("__big").cast("double") / col("n_cells").cast("double"))
          .as("share_off_by_5"))

  val defs: Map[String, Q] = Map(
    "q_dp_histogram" -> ((s, dir) => dpHistogram(Tables.documents(s, dir))),
    "q_dp_utility" -> ((s, dir) => dpUtility(Tables.documents(s, dir))))

  /** Noisy-cell CTE chain (no leading WITH), shared. */
  private val DpSql: String =
    s"""cells AS (
       |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
       |  FROM documents GROUP BY source, lang),
       |uu AS (
       |  SELECT source, lang, n,
       |    CAST(('0x' || substr(md5('dp#' || source || '#' || lang),
       |      1, 15))::BIGINT AS DOUBLE) / ${Pow60}.0 AS u
       |  FROM cells),
       |nz AS (
       |  SELECT source, lang, n,
       |    -$InvEps * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
       |      * round(ln(greatest(1.0 - 2.0 * abs(u - 0.5),
       |          1.0 / ${Pow60}.0)), 6) AS noise
       |  FROM uu)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_dp_histogram" ->
      s"""WITH $DpSql
         |SELECT source, lang, n, noise,
         |  CAST(n AS DOUBLE) + noise AS noisy_count
         |FROM nz
         |ORDER BY source, lang""".stripMargin,

    "q_dp_utility" ->
      s"""WITH $DpSql
         |SELECT CAST(${1.0 / InvEps} AS DOUBLE) AS eps,
         |  CAST(count(*) AS BIGINT) AS n_cells,
         |  CAST(sum(CAST(floor(abs(noise) * 1.0e6 + 0.5) AS BIGINT))
         |    AS DOUBLE) / CAST(count(*) * 1000000 AS DOUBLE)
         |    AS mean_abs_err,
         |  max(abs(noise)) AS max_abs_err,
         |  CAST(sum(CASE WHEN abs(noise) > 5.0 THEN 1 ELSE 0 END)
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS share_off_by_5
         |FROM nz""".stripMargin)
}
