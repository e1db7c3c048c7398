package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-fifty-third wave — the DATASET CARD: the one-row datasheet
  * (and its per-language breakdown) that fronts a published corpus —
  * sizes, composition, duplication, length profile — assembled as one
  * pass of exact aggregates. This is the integration row a data lead
  * pastes into the release notes; every number is already defined by
  * an existing operator family, restated here as a single artifact.
  *
  * Columns: doc/token/source/lang counts; exact-duplicate rate
  * (1 − |distinct md5(norm text)|/n); short-doc share (< 20 tokens —
  * the Breadth148 gate's floor); mean chars (integer sum, one
  * division); median tokens (LOWER median — the rank-picked
  * ⌈n/2⌉-th smallest under the total order (n_tokens, doc_id),
  * engine-exact; no interpolation, so no double ever ranks).
  *
  * Scale shape: one token-count map pass; the median is a rank window
  * at gate SFs with the documented approx_percentile swap at 100 TB;
  * everything else is count-distinct / conditional-sum aggregates
  * with map-side partials (count_distinct of the md5 exact-dup key is
  * itself the documented HLL swap point at warehouse scale).
  */
object Breadth152 {

  private[graft] val ShortTok = 20

  /** Per-doc features the card aggregates. */
  private[graft] def cardBase(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("lang"),
      col("n_chars"),
      size(graft.text.Text.tokens(col("text"))).cast("long")
        .as("__ntok"),
      md5(graft.text.Text.norm(col("text"))).as("__h"))

  /** The one-row dataset card. */
  private[graft] def datasetCard(docs: DataFrame): DataFrame = {
    val base = cardBase(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = base
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__ntok").asc, col("doc_id").asc)).cast("long"))
      .crossJoin(broadcast(base.agg(count(lit(1)).as("__n"))))
      .filter(col("__rk") === expr("(__n + 1) div 2"))
      .select(col("__ntok").as("median_tokens"))
    base.agg(
        count(lit(1)).as("n_docs"),
        sum(col("__ntok")).as("n_tokens"),
        count_distinct(col("source")).as("n_sources"),
        count_distinct(col("lang")).as("n_langs"),
        count_distinct(col("__h")).as("__uniq"),
        sum(when(col("__ntok") < ShortTok, 1L).otherwise(0L))
          .as("n_short"),
        sum(col("n_chars")).as("__chars"))
      .crossJoin(broadcast(med))
      .select(col("n_docs"), col("n_tokens"), col("n_sources"),
        col("n_langs"),
        (lit(1.0) - col("__uniq").cast("double")
          / col("n_docs").cast("double")).as("dup_rate"),
        (col("n_short").cast("double") / col("n_docs").cast("double"))
          .as("short_share"),
        (col("__chars").cast("double") / col("n_docs").cast("double"))
          .as("mean_chars"),
        col("median_tokens"))
  }

  /** Per-language cards (median computed within language). */
  private[graft] def datasetCardByLang(docs: DataFrame): DataFrame = {
    val base = cardBase(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wl = Window.partitionBy(col("lang"))
      .orderBy(col("__ntok").asc, col("doc_id").asc)
    val med = base
      .withColumn("__rk", row_number().over(wl).cast("long"))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col("lang"))))
      .filter(col("__rk") === expr("(__n + 1) div 2"))
      .select(col("lang"), col("__ntok").as("median_tokens"))
    base.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ntok")).as("n_tokens"),
        count_distinct(col("source")).as("n_sources"),
        count_distinct(col("__h")).as("__uniq"),
        sum(when(col("__ntok") < ShortTok, 1L).otherwise(0L))
          .as("n_short"),
        sum(col("n_chars")).as("__chars"))
      .join(med, Seq("lang"))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        col("n_sources"),
        (lit(1.0) - col("__uniq").cast("double")
          / col("n_docs").cast("double")).as("dup_rate"),
        (col("n_short").cast("double") / col("n_docs").cast("double"))
          .as("short_share"),
        (col("__chars").cast("double") / col("n_docs").cast("double"))
          .as("mean_chars"),
        col("median_tokens"))
      .orderBy(col("lang").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_dataset_card" -> ((s, dir) =>
      datasetCard(Tables.documents(s, dir))),
    "q_dataset_card_lang" -> ((s, dir) =>
      datasetCardByLang(Tables.documents(s, dir))))

  /** Per-doc feature CTE (no leading WITH), shared. */
  private val CardSql: String =
    s"""cb AS (
       |  SELECT doc_id, source, lang, n_chars,
       |    CAST(len(${Extensions.sqlTokens("text")}) AS BIGINT) AS ntok,
       |    md5(${Extensions.sqlNorm("text")}) AS h
       |  FROM documents)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_dataset_card" ->
      s"""WITH $CardSql,
         |md AS (
         |  SELECT ntok AS median_tokens FROM (
         |    SELECT ntok, row_number() OVER (ORDER BY ntok, doc_id)
         |      AS rk, count(*) OVER () AS n
         |    FROM cb) r
         |  WHERE rk = (n + 1) // 2)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
         |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |  1.0 - CAST(count(DISTINCT h) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS dup_rate,
         |  CAST(sum(CASE WHEN ntok < $ShortTok THEN 1 ELSE 0 END)
         |      AS DOUBLE) / CAST(count(*) AS DOUBLE) AS short_share,
         |  CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS mean_chars,
         |  (SELECT median_tokens FROM md) AS median_tokens
         |FROM cb""".stripMargin,

    "q_dataset_card_lang" ->
      s"""WITH $CardSql,
         |md AS (
         |  SELECT lang, ntok AS median_tokens FROM (
         |    SELECT lang, ntok,
         |      row_number() OVER (PARTITION BY lang ORDER BY ntok, doc_id)
         |        AS rk,
         |      count(*) OVER (PARTITION BY lang) AS n
         |    FROM cb) r
         |  WHERE rk = (n + 1) // 2)
         |SELECT c.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
         |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |  1.0 - CAST(count(DISTINCT h) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS dup_rate,
         |  CAST(sum(CASE WHEN ntok < $ShortTok THEN 1 ELSE 0 END)
         |      AS DOUBLE) / CAST(count(*) AS DOUBLE) AS short_share,
         |  CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS mean_chars,
         |  max(m.median_tokens) AS median_tokens
         |FROM cb c JOIN md m ON c.lang = m.lang
         |GROUP BY c.lang
         |ORDER BY c.lang""".stripMargin)
}
