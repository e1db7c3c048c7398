package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hundred-forty-sixth wave — SPLIT-CONFORMAL PREDICTION over the
  * document corpus: the distribution-free uncertainty wrapper every
  * production scorer should ship with. The corpus hash-splits into a
  * calibration and a test half (md5 parity — the q_hash_split
  * convention), a base predictor fits on calibration only (per-source
  * floored-mean n_chars — conformal makes NO assumption about its
  * quality), nonconformity is |y − ŷ|, and the calibration quantile
  *   q̂ = the ⌈(n_cal + 1)(1 − α)⌉-th smallest calibration score
  * (α = 0.1) yields intervals ŷ ± q̂ whose test coverage is
  * ≥ 1 − α in expectation — the audit row this wave emits.
  *
  * Exact-parity discipline: everything is integer — scores are
  * |n_chars − (sum div n)| (trunc-division means, the DuckDB `//`
  * twin), the quantile RANK is ⌈(n_cal+1)·9/10⌉ = ((n_cal+1)·9 + 9)
  * div 10 in integer arithmetic, the order statistic is picked by
  * row_number over (score, doc_id) — a total order — and coverage is
  * one division of two counts. No doubles until the emitted ratios.
  *
  * Scale shape: the split and scores are per-row map work; the
  * predictor is a |sources|-row aggregate broadcast back; the order
  * statistic needs the rank of ONE position — at gate SFs a window
  * row_number, at 100 TB the documented swap is a 2-pass select-k
  * (count-below histogram on quantized scores), both engines pinned
  * on the same value; coverage is a global conditional count.
  */
object Breadth145 {

  private[graft] val ConfAlphaNum = 9 // 1-alpha = 9/10

  private def bucket(id: org.apache.spark.sql.Column) =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(2L))

  /** (doc_id, source, n_chars, is_cal) with the md5-parity split. */
  private[graft] def confSplit(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("n_chars"),
      (bucket(col("doc_id")) === 0L).as("__cal"))

  /** Per-row nonconformity vs the per-source calibration mean. */
  private[graft] def confScores(docs: DataFrame): DataFrame = {
    val split = confSplit(docs)
    val pred = split.filter(col("__cal"))
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).as("__s"), count(lit(1)).as("__n"))
      .select(col("source"), expr("__s div __n").as("__pred"))
    split.join(broadcast(pred), Seq("source"))
      .select(col("doc_id"), col("source"), col("__cal"),
        abs(col("n_chars") - col("__pred")).as("__score"))
  }

  /** One audit row: calibration size, q̂, test size, coverage. */
  private[graft] def conformal(docs: DataFrame): DataFrame = {
    val scores = confScores(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cal = scores.filter(col("__cal"))
    val nCal = cal.agg(count(lit(1)).as("n_cal"))
    val ranked = cal.withColumn("__rn", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("__score").asc, col("doc_id").asc)))
    val qhat = ranked.crossJoin(broadcast(nCal))
      .filter(col("__rn") ===
        expr(s"((n_cal + 1) * $ConfAlphaNum + 9) div 10"))
      .select(col("n_cal"), col("__score").as("qhat"))
    scores.filter(!col("__cal"))
      .crossJoin(broadcast(qhat))
      .agg(max(col("n_cal")).as("n_cal"), max(col("qhat")).as("qhat"),
        count(lit(1)).as("n_test"),
        sum(when(col("__score") <= col("qhat"), 1L).otherwise(0L))
          .as("n_covered"))
      .select(col("n_cal"), col("qhat"), col("n_test"), col("n_covered"),
        (col("n_covered").cast("double") / col("n_test").cast("double"))
          .as("coverage"))
  }

  /** Per-source test coverage under the GLOBAL q̂ — the fairness audit
    * (which sources the one-size interval under-covers). */
  private[graft] def conformalBySource(docs: DataFrame): DataFrame = {
    val scores = confScores(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cal = scores.filter(col("__cal"))
    val nCal = cal.agg(count(lit(1)).as("__ncal"))
    val ranked = cal.withColumn("__rn", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("__score").asc, col("doc_id").asc)))
    val qhat = ranked.crossJoin(broadcast(nCal))
      .filter(col("__rn") ===
        expr(s"((__ncal + 1) * $ConfAlphaNum + 9) div 10"))
      .select(col("__score").as("__qhat"))
    scores.filter(!col("__cal"))
      .crossJoin(broadcast(qhat))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__score") <= col("__qhat"), 1L).otherwise(0L))
          .as("n_covered"))
      .select(col("source"), col("n_test"), col("n_covered"),
        (col("n_covered").cast("double") / col("n_test").cast("double"))
          .as("coverage"))
      .orderBy(col("source").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_conformal" -> ((s, dir) => conformal(Tables.documents(s, dir))),
    "q_conformal_sources" -> ((s, dir) =>
      conformalBySource(Tables.documents(s, dir))))

  /** Split + score + q̂ CTE chain (no leading WITH), shared. */
  private val ConfSql: String =
    s"""sp AS (
       |  SELECT doc_id, source, n_chars,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
       |      % 2 = 0 AS cal
       |  FROM documents),
       |pr AS (
       |  SELECT source,
       |    CAST(sum(n_chars) AS BIGINT) // CAST(count(*) AS BIGINT)
       |      AS pred
       |  FROM sp WHERE cal GROUP BY source),
       |sc AS (
       |  SELECT s.doc_id, s.source, s.cal, abs(s.n_chars - p.pred)
       |    AS score
       |  FROM sp s JOIN pr p ON s.source = p.source),
       |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM sc WHERE cal),
       |qh AS (
       |  SELECT n_cal, score AS qhat FROM (
       |    SELECT score, row_number() OVER (ORDER BY score, doc_id) AS rn
       |    FROM sc WHERE cal) r
       |  CROSS JOIN nc
       |  WHERE r.rn = ((n_cal + 1) * $ConfAlphaNum + 9) // 10)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_conformal" ->
      s"""WITH $ConfSql
         |SELECT q.n_cal, q.qhat,
         |  CAST(count(*) AS BIGINT) AS n_test,
         |  CAST(sum(CASE WHEN s.score <= q.qhat THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_covered,
         |  CAST(sum(CASE WHEN s.score <= q.qhat THEN 1 ELSE 0 END)
         |      AS DOUBLE) / CAST(count(*) AS DOUBLE) AS coverage
         |FROM sc s CROSS JOIN qh q
         |WHERE NOT s.cal
         |GROUP BY q.n_cal, q.qhat""".stripMargin,

    "q_conformal_sources" ->
      s"""WITH $ConfSql
         |SELECT s.source, CAST(count(*) AS BIGINT) AS n_test,
         |  CAST(sum(CASE WHEN s.score <= q.qhat THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_covered,
         |  CAST(sum(CASE WHEN s.score <= q.qhat THEN 1 ELSE 0 END)
         |      AS DOUBLE) / CAST(count(*) AS DOUBLE) AS coverage
         |FROM sc s CROSS JOIN qh q
         |WHERE NOT s.cal
         |GROUP BY s.source
         |ORDER BY s.source""".stripMargin)
}
