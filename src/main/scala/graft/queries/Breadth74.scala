package graft.queries

import graft.Tables
import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventy-fifth wave — corpus diversity, per-source length shape,
  * windowed lexical richness.
  *
  *  - **q_simpson_diversity**: the Simpson/Hunter–Gaston diversity of
  *    each source's unigram distribution, D = 1 − Σc(c−1)/(N(N−1)) —
  *    the probability two draws differ. Fully integer until ONE
  *    division (no logs at all — the exact-parity sibling of the
  *    entropy measures).
  *  - **q_length_quartiles**: exact p25/p50/p75 doc-length order
  *    statistics per source (rn = ceil(q·n) under the fully
  *    tie-broken (n_chars, doc_id) order — the q_tail_ratio
  *    discipline; integers out, nothing interpolated).
  *  - **q_ttr_window**: type-token ratio over each doc's first
  *    `TtrW`-token window — the fixed-window TTR that makes lexical
  *    richness comparable across lengths (raw TTR falls with length).
  *    Distinct count over a bounded token slice; one division.
  *
  * Scale shape: simpson aggregates the (source, token) count table
  * (|vocab|-bounded per source); length_quartiles windows over
  * |docs-per-source| with integer emit; ttr_window is map-only per
  * doc (the slice bounds the per-row work regardless of doc size). */
object Breadth74 {

  private[graft] val TtrW = 100

  /** Simpson diversity per source over whitespace unigrams. */
  private[graft] def simpsonDiversity(docs: DataFrame, srcCol: String,
                                      textCol: String): DataFrame = {
    val sc = docs
      .select(col(srcCol), explode(Text.tokens(col(textCol))).as("tok"))
      .groupBy(col(srcCol), col("tok")).agg(count(lit(1)).as("__c"))
    sc.groupBy(col(srcCol).as("source"))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("__c") * (col("__c") - lit(1L))).as("__rep"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        when(col("n_tokens") > 1,
          lit(1.0) - col("__rep").cast("double") /
            (col("n_tokens") * (col("n_tokens") - lit(1L))).cast("double"))
          .as("simpson"))
      .orderBy(col("source").asc)
  }

  /** Exact p25/p50/p75 of `vCol` per stratum (lower order statistic,
    * (v, idCol) tie-broken). */
  private[graft] def lengthQuartiles(df: DataFrame, stratCol: String,
                                     vCol: String, idCol: String): DataFrame = {
    df.select(col(stratCol).as("source"), col(vCol).as("__v"),
        col(idCol).as("__id"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("__v").asc, col("__id").asc)))
      .withColumn("__cnt", count(lit(1)).over(
        Window.partitionBy(col("source"))))
      .groupBy(col("source"))
      .agg(max(col("__cnt")).as("n_docs"),
        max(when(col("__rn") === expr("(__cnt + 3) div 4"), col("__v")))
          .as("p25"),
        max(when(col("__rn") === expr("(__cnt + 1) div 2"), col("__v")))
          .as("p50"),
        max(when(col("__rn") === expr("(3 * __cnt + 3) div 4"), col("__v")))
          .as("p75"))
      .orderBy(col("source").asc)
  }

  /** TTR over the first `w` tokens per doc. */
  private[graft] def ttrWindow(docs: DataFrame, idCol: String,
                               textCol: String, w: Int = TtrW): DataFrame =
    docs.select(col(idCol),
        slice(Text.tokens(col(textCol)), 1, w).as("__w"))
      .select(col(idCol),
        size(col("__w")).cast("long").as("n_window"),
        size(array_distinct(col("__w"))).cast("long").as("n_types"))
      .select(col(idCol), col("n_window"), col("n_types"),
        when(col("n_window") > 0,
          col("n_types").cast("double") / col("n_window").cast("double"))
          .as("ttr"))
      .orderBy(col(idCol).asc)

  val defs: Map[String, Q] = Map(
    "q_simpson_diversity" -> ((s, dir) =>
      simpsonDiversity(Tables.documents(s, dir), "source", "text")),
    "q_length_quartiles" -> ((s, dir) =>
      lengthQuartiles(Tables.documents(s, dir), "source", "n_chars",
        "doc_id")),
    "q_ttr_window" -> ((s, dir) =>
      ttrWindow(Tables.documents(s, dir), "doc_id", "text")))

  /** Oracle tokenization twin of Text.tokens. */
  private val tokSql =
    """regexp_split_to_array(
      |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"""
      .stripMargin

  val oracle: Map[String, String] = Map(
    "q_simpson_diversity" ->
      s"""WITH tk AS (
         |  SELECT source, unnest($tokSql) AS tok FROM documents),
         |sc AS (
         |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
         |  FROM tk GROUP BY 1, 2),
         |g AS (
         |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS n_types,
         |    CAST(sum(c * (c - 1)) AS BIGINT) AS rep
         |  FROM sc GROUP BY 1)
         |SELECT source, n_tokens, n_types,
         |  CASE WHEN n_tokens > 1
         |    THEN 1.0 - CAST(rep AS DOUBLE)
         |      / CAST(n_tokens * (n_tokens - 1) AS DOUBLE) END AS simpson
         |FROM g ORDER BY source""".stripMargin,

    "q_length_quartiles" ->
      """WITH r AS (
        |  SELECT source, n_chars AS v,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS cnt
        |  FROM documents)
        |SELECT source, CAST(max(cnt) AS BIGINT) AS n_docs,
        |  CAST(max(CASE WHEN rn = (cnt + 3) // 4 THEN v END) AS BIGINT)
        |    AS p25,
        |  CAST(max(CASE WHEN rn = (cnt + 1) // 2 THEN v END) AS BIGINT)
        |    AS p50,
        |  CAST(max(CASE WHEN rn = (3 * cnt + 3) // 4 THEN v END) AS BIGINT)
        |    AS p75
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "q_ttr_window" ->
      s"""WITH w AS (
         |  SELECT doc_id, list_slice($tokSql, 1, ${TtrW}) AS wt
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(wt) AS BIGINT) AS n_window,
         |  CAST(len(list_distinct(wt)) AS BIGINT) AS n_types,
         |  CASE WHEN len(wt) > 0
         |    THEN CAST(len(list_distinct(wt)) AS DOUBLE)
         |      / CAST(len(wt) AS DOUBLE) END AS ttr
         |FROM w ORDER BY doc_id""".stripMargin)
}
