package graft.queries

import graft.Tables
import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventy-eighth wave — corpus accounting: dedup impact, template
  * starts, character composition.
  *
  *  - **q_dup_inflation**: what exact-text duplication costs per
  *    source — docs and tokens BEFORE vs AFTER exact dedup (md5(text)
  *    identity, first doc_id survives — the q_dedup_exact
  *    survivorship), and the token inflation ratio. One division;
  *    everything else integer counts.
  *  - **q_prefix_dup**: template-start detection — docs sharing their
  *    first-5-token prefix within a source form a template cluster;
  *    emitted per source as cluster count and the share of docs
  *    sitting in any cluster. The boilerplate screen at the document
  *    START (q_boilerplate's shingle form is position-free).
  *  - **q_char_classes**: per-source character composition — letter /
  *    digit / space shares via regexp strip-and-measure (identical
  *    character classes on both engines; `other` is the exact
  *    remainder). Integer sums, three divisions.
  *
  * Scale shape: all three are one doc-grain map + one per-source
  * aggregate; prefix_dup's only shuffle is the |source·prefix|-bounded
  * groupBy. Nothing re-reads text twice. */
object Breadth77 {

  private[graft] val PrefixLen = 5

  /** Exact-dup doc/token accounting per source. */
  private[graft] def dupInflation(docs: DataFrame, srcCol: String,
                                  idCol: String, textCol: String): DataFrame = {
    val d = docs.select(col(srcCol).as("source"), col(idCol),
        md5(col(textCol)).as("__h"),
        Text.nTokens(col(textCol)).cast("long").as("__nt"))
      .withColumn("__rep", row_number().over(
        Window.partitionBy(col("source"), col("__h"))
          .orderBy(col(idCol).asc)) === 1)
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__rep"), lit(1L)).otherwise(lit(0L)))
          .as("n_unique"),
        sum(col("__nt")).as("tokens_total"),
        sum(when(col("__rep"), col("__nt")).otherwise(lit(0L)))
          .as("tokens_unique"))
      .select(col("source"), col("n_docs"), col("n_unique"),
        col("tokens_total"), col("tokens_unique"),
        when(col("tokens_unique") > 0,
          col("tokens_total").cast("double") /
            col("tokens_unique").cast("double")).as("inflation"))
      .orderBy(col("source").asc)
  }

  /** First-k-token template clusters per source. */
  private[graft] def prefixDup(docs: DataFrame, srcCol: String,
                               textCol: String,
                               k: Int = PrefixLen): DataFrame = {
    val pre = docs.select(col(srcCol).as("source"),
      array_join(slice(Text.tokens(col(textCol)), 1, k), " ").as("__p"))
    val clusters = pre.groupBy(col("source"), col("__p"))
      .agg(count(lit(1)).as("__c"))
    clusters.groupBy(col("source"))
      .agg(sum(col("__c")).as("n_docs"),
        sum(when(col("__c") > 1, lit(1L)).otherwise(lit(0L)))
          .as("n_clusters"),
        sum(when(col("__c") > 1, col("__c")).otherwise(lit(0L)))
          .as("docs_in_clusters"))
      .select(col("source"), col("n_docs"), col("n_clusters"),
        col("docs_in_clusters"),
        (col("docs_in_clusters").cast("double") /
          col("n_docs").cast("double")).as("template_share"))
      .orderBy(col("source").asc)
  }

  /** Letter/digit/space/other composition per source. */
  private[graft] def charClasses(docs: DataFrame, srcCol: String,
                                 textCol: String): DataFrame = {
    val t = col(textCol)
    def stripped(cls: String) =
      (length(t) - length(regexp_replace(t, cls, ""))).cast("long")
    val g = docs
      .select(col(srcCol).as("source"),
        length(t).cast("long").as("__n"),
        stripped("[A-Za-z]").as("__l"),
        stripped("[0-9]").as("__d"),
        stripped("[ ]").as("__s"))
      .groupBy(col("source"))
      .agg(sum(col("__n")).as("n_chars"), sum(col("__l")).as("__sl"),
        sum(col("__d")).as("__sd"), sum(col("__s")).as("__ss"))
    val nD = col("n_chars").cast("double")
    g.select(col("source"), col("n_chars"),
      (col("__sl").cast("double") / nD).as("letter_share"),
      (col("__sd").cast("double") / nD).as("digit_share"),
      (col("__ss").cast("double") / nD).as("space_share"),
      ((col("n_chars") - col("__sl") - col("__sd") - col("__ss"))
        .cast("double") / nD).as("other_share"))
      .orderBy(col("source").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_dup_inflation" -> ((s, dir) =>
      dupInflation(Tables.documents(s, dir), "source", "doc_id", "text")),
    "q_prefix_dup" -> ((s, dir) =>
      prefixDup(Tables.documents(s, dir), "source", "text")),
    "q_char_classes" -> ((s, dir) =>
      charClasses(Tables.documents(s, dir), "source", "text")))

  /** Oracle tokenization twin of Text.tokens. */
  private val tokSql =
    """regexp_split_to_array(
      |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"""
      .stripMargin

  val oracle: Map[String, String] = Map(
    "q_dup_inflation" ->
      s"""WITH d AS (
         |  SELECT source, doc_id, md5(text) AS h,
         |    CAST(len($tokSql) AS BIGINT) AS nt,
         |    row_number() OVER (PARTITION BY source, md5(text)
         |      ORDER BY doc_id) = 1 AS rep
         |  FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN rep THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_unique,
         |  CAST(sum(nt) AS BIGINT) AS tokens_total,
         |  CAST(sum(CASE WHEN rep THEN nt ELSE 0 END) AS BIGINT)
         |    AS tokens_unique,
         |  CASE WHEN sum(CASE WHEN rep THEN nt ELSE 0 END) > 0
         |    THEN CAST(CAST(sum(nt) AS BIGINT) AS DOUBLE)
         |      / CAST(CAST(sum(CASE WHEN rep THEN nt ELSE 0 END)
         |        AS BIGINT) AS DOUBLE) END AS inflation
         |FROM d GROUP BY source ORDER BY source""".stripMargin,

    "q_prefix_dup" ->
      s"""WITH pre AS (
         |  SELECT source,
         |    array_to_string(list_slice($tokSql, 1, $PrefixLen), ' ')
         |      AS p
         |  FROM documents),
         |cl AS (
         |  SELECT source, p, CAST(count(*) AS BIGINT) AS c
         |  FROM pre GROUP BY 1, 2)
         |SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_clusters,
         |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
         |    AS docs_in_clusters,
         |  CAST(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
         |      AS DOUBLE)
         |    / CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) AS template_share
         |FROM cl GROUP BY source ORDER BY source""".stripMargin,

    "q_char_classes" ->
      """WITH d AS (
        |  SELECT source, CAST(length(text) AS BIGINT) AS n,
        |    CAST(length(text)
        |      - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
        |      AS BIGINT) AS l,
        |    CAST(length(text)
        |      - length(regexp_replace(text, '[0-9]', '', 'g'))
        |      AS BIGINT) AS dg,
        |    CAST(length(text)
        |      - length(regexp_replace(text, '[ ]', '', 'g'))
        |      AS BIGINT) AS sp
        |  FROM documents),
        |g AS (
        |  SELECT source, CAST(sum(n) AS BIGINT) AS n_chars,
        |    CAST(sum(l) AS BIGINT) AS sl, CAST(sum(dg) AS BIGINT) AS sd,
        |    CAST(sum(sp) AS BIGINT) AS ss
        |  FROM d GROUP BY 1)
        |SELECT source, n_chars,
        |  CAST(sl AS DOUBLE) / CAST(n_chars AS DOUBLE) AS letter_share,
        |  CAST(sd AS DOUBLE) / CAST(n_chars AS DOUBLE) AS digit_share,
        |  CAST(ss AS DOUBLE) / CAST(n_chars AS DOUBLE) AS space_share,
        |  CAST(n_chars - sl - sd - ss AS DOUBLE)
        |    / CAST(n_chars AS DOUBLE) AS other_share
        |FROM g ORDER BY source""".stripMargin)
}
