package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-thirty-ninth wave — the classifier-evaluation tier every
  * LLM-data quality classifier needs before its scores are trusted to
  * gate a corpus: exact ROC-AUC, average precision, and a calibration
  * table with a Brier score. The "classifier" under evaluation is the
  * deterministic document score `n_chars` against the binary label
  * `lang = 'en'` (is-English), evaluated per `source` — the exact
  * shape of auditing a fastText-style quality/language filter against
  * gold labels, one audit row per crawl source.
  *
  * Exact-parity discipline:
  *  - **AUC** uses the Mann–Whitney rank formulation with tie-averaged
  *    ranks kept in INTEGER half-units: 2·avgrank = 2·minrank + ties−1
  *    (all window integers), so the positive rank sum R2 = Σ 2·avgrank
  *    is an order-free integer sum; AUC = (R2 − n₁(n₁+1)) / (2n₁n₀) is
  *    ONE double expression per group over integers. Int64 headroom:
  *    R2 ≤ 2n² — wraps past n ≈ 2.1e9 rows per source; past that,
  *    aggregate per-tie-group first (count·avgrank) which drops the
  *    bound to 2n·|ties|.
  *  - **Average precision** ranks score-DESC with doc_id ASC as the
  *    deterministic tie-break (a total order, so both engines see the
  *    same permutation); each relevant rank's P@k = hits/k is one
  *    double division of identical integers, quantized to 1e-9 units
  *    (floor(·1e9 + 0.5)) BEFORE the per-group sum — integer
  *    accumulation, one terminal division. Headroom: n_pos·1e9 wraps
  *    past ~9.2e9 positives per source; the scale constant is the knob.
  *  - **Calibration** bins the pseudo-probability p = (n_chars mod
  *    101)/101 into deciles; per-bin mean-p and the Brier term
  *    (p−y)² are per-row doubles quantized to integer units (1e-6 for
  *    p, 1e-12 for Brier) before the order-free integer sums.
  *
  * Scale shape: one shuffle on (source) [AUC ranks: window over
  * (source, score) tie groups then (source)], one on (source, bin) —
  * no joins beyond the window partitioning; everything downstream of
  * a 50k-row-per-source rank is a hash aggregate with map-side
  * partials. At 100 TB the rank windows sort within source partitions
  * only (no global sort); a skewed source salts the tie-count
  * aggregation (two-level: (source, score) groupBy is already the
  * tie-group reduction).
  */
object Breadth138 {

  private[graft] val CalibMod = 101

  /** Exact tie-handled ROC-AUC of `score` against boolean `pos`,
    * per `grp`. Returns (grp, n_pos, n_neg, auc). */
  private[graft] def aucByGroup(df: DataFrame, grp: String, score: String,
                                pos: String): DataFrame = {
    // 2·average-rank for every row, in integer half-units:
    // rank() is the tie-group min rank; avg = min + (ties−1)/2.
    val wRank = Window.partitionBy(col(grp)).orderBy(col(score).asc)
    val wTies = Window.partitionBy(col(grp), col(score))
    val ranked = df
      .withColumn("__r2",
        lit(2) * rank().over(wRank).cast("long")
          + count(lit(1)).over(wTies) - lit(1L))
    ranked.groupBy(col(grp))
      .agg(
        sum(when(col(pos), col("__r2")).otherwise(lit(0L))).as("__rp2"),
        sum(when(col(pos), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col(pos), 0L).otherwise(1L)).as("n_neg"))
      .select(col(grp), col("n_pos"), col("n_neg"),
        ((col("__rp2") - col("n_pos") * (col("n_pos") + 1)).cast("double")
          / (lit(2.0) * col("n_pos").cast("double")
            * col("n_neg").cast("double"))).as("auc"))
  }

  private[graft] def auc(docs: DataFrame): DataFrame =
    aucByGroup(
      docs.select(col("source"), col("n_chars").as("__score"),
        (col("lang") === "en").as("__pos")),
      "source", "__score", "__pos")
      .orderBy(col("source").asc)

  /** Exact average precision per group: score DESC, doc_id ASC
    * tie-break; AP = Σ_{k rel} P@k / n_pos with P@k quantized to 1e-9
    * before the integer sum. */
  private[graft] def avgPrecision(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    docs
      .select(col("source"), col("doc_id"), col("n_chars"),
        (col("lang") === "en").as("__pos"))
      .withColumn("__k", row_number().over(w).cast("long"))
      .withColumn("__hits",
        sum(when(col("__pos"), 1L).otherwise(0L)).over(run))
      .filter(col("__pos"))
      .select(col("source"),
        floor(col("__hits").cast("double") / col("__k").cast("double")
          * lit(1.0e9) + lit(0.5)).cast("long").as("__pq"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_pos"), sum(col("__pq")).as("__sum"))
      .select(col("source"), col("n_pos"),
        (col("__sum").cast("double")
          / (lit(1.0e9) * col("n_pos").cast("double"))).as("avg_precision"))
      .orderBy(col("source").asc)
  }

  /** Global calibration table: pseudo-probability p = (n_chars mod
    * 101)/101 vs y = (lang = 'en'), decile bins; per-bin n, positive
    * count, mean predicted p, empirical rate, and the bin's Brier
    * contribution mean (p−y)². */
  private[graft] def calibration(docs: DataFrame): DataFrame = {
    val p = (col("n_chars") % CalibMod).cast("double") / lit(CalibMod.toDouble)
    val y = when(col("lang") === "en", 1L).otherwise(0L)
    docs
      .select(
        least(floor(p * lit(10)).cast("long"), lit(9L)).as("bin"),
        floor(p * lit(1.0e6) + lit(0.5)).cast("long").as("__pq"),
        y.as("__y"),
        floor((p - y.cast("double")) * (p - y.cast("double"))
          * lit(1.0e12) + lit(0.5)).cast("long").as("__bq"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__y")).as("n_pos"),
        sum(col("__pq")).as("__sp"),
        sum(col("__bq")).as("__sb"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("__sp").cast("double")
          / (lit(1.0e6) * col("n").cast("double"))).as("mean_p"),
        (col("n_pos").cast("double") / col("n").cast("double"))
          .as("pos_rate"),
        (col("__sb").cast("double")
          / (lit(1.0e12) * col("n").cast("double"))).as("brier"))
      .orderBy(col("bin").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_auc" -> ((s, dir) => auc(Tables.documents(s, dir))),
    "q_avg_precision" -> ((s, dir) =>
      avgPrecision(Tables.documents(s, dir))),
    "q_calibration" -> ((s, dir) =>
      calibration(Tables.documents(s, dir))))

  val oracle: Map[String, String] = Map(
    "q_auc" ->
      """WITH r AS (
        |  SELECT source, lang = 'en' AS pos,
        |    2 * rank() OVER (PARTITION BY source ORDER BY n_chars)
        |      + count(*) OVER (PARTITION BY source, n_chars) - 1 AS r2
        |  FROM documents)
        |SELECT source,
        |  CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS n_neg,
        |  CAST(sum(CASE WHEN pos THEN r2 ELSE 0 END)
        |      - sum(CASE WHEN pos THEN 1 ELSE 0 END)
        |        * (sum(CASE WHEN pos THEN 1 ELSE 0 END) + 1) AS DOUBLE)
        |    / (2.0 * CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
        |      * CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS DOUBLE)) AS auc
        |FROM r
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q_avg_precision" ->
      """WITH r AS (
        |  SELECT source, lang = 'en' AS pos,
        |    CAST(row_number() OVER w AS BIGINT) AS k,
        |    -- doc_id makes the order total, so the default RANGE frame
        |    -- is exactly the running-rows frame
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) OVER w AS hits
        |  FROM documents
        |  WINDOW w AS (PARTITION BY source ORDER BY n_chars DESC, doc_id))
        |SELECT source, CAST(count(*) AS BIGINT) AS n_pos,
        |  CAST(sum(CAST(floor(CAST(hits AS DOUBLE) / CAST(k AS DOUBLE)
        |      * 1.0e9 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / (1.0e9 * CAST(count(*) AS DOUBLE)) AS avg_precision
        |FROM r WHERE pos
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q_calibration" ->
      """WITH t AS (
        |  SELECT
        |    least(CAST(floor(CAST(n_chars % 101 AS DOUBLE) / 101.0 * 10)
        |      AS BIGINT), 9) AS bin,
        |    CAST(floor(CAST(n_chars % 101 AS DOUBLE) / 101.0 * 1.0e6 + 0.5)
        |      AS BIGINT) AS pq,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |    CAST(floor((CAST(n_chars % 101 AS DOUBLE) / 101.0
        |        - CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END)
        |      * (CAST(n_chars % 101 AS DOUBLE) / 101.0
        |        - CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END)
        |      * 1.0e12 + 0.5) AS BIGINT) AS bq
        |  FROM documents)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(y) AS BIGINT) AS n_pos,
        |  CAST(sum(pq) AS DOUBLE) / (1.0e6 * CAST(count(*) AS DOUBLE))
        |    AS mean_p,
        |  CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pos_rate,
        |  CAST(sum(bq) AS DOUBLE) / (1.0e12 * CAST(count(*) AS DOUBLE))
        |    AS brier
        |FROM t
        |GROUP BY bin
        |ORDER BY bin""".stripMargin)
}
