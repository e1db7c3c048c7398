package graft.queries

import graft.Tables
import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Forty-ninth wave — corpus novelty accounting.
  *
  * Dedup answers "is this a copy"; curation ALSO needs "how much new
  * content does each increment add" — the marginal-value signal that
  * decides whether to keep crawling a source. Two queries over 3-token
  * shingle sets (the MinHash pipeline's unit, `Text.shingleSet` /
  * `sqlShingleSet` — one definition on each engine):
  *
  *  - **q_novelty**: per document in arrival order (doc_id), the
  *    fraction of its distinct shingles whose FIRST corpus occurrence
  *    is this document (min doc_id attribution — ties impossible:
  *    min is unique per shingle). Early docs score ~1, late near-dups
  *    ~0; the decay rate is the corpus's redundancy growth curve.
  *  - **q_source_redundancy**: per source, distinct-shingle occurrence
  *    mass vs unique shingles — the dedup-potential ratio
  *    (occ − uniq)/occ that ranks sources by how much a shingle-level
  *    dedup would shrink them.
  *
  * Scale shape: one shingle explode + one groupBy(shingle) for the
  * first-occurrence table (|vocab|-bounded, the q_tfidf pattern), one
  * groupBy(doc)/groupBy(source) rollup; every output is an exact
  * integer or one division of two exact integers. */
object Breadth48 {

  private[graft] val NovShingleLen = 3

  /** (doc_id, sh) distinct pairs — each document's shingle SET. */
  private def docShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(Text.shingleSet(col("text"), NovShingleLen)).as("sh"))

  private[graft] def novelty(docs: DataFrame): DataFrame = {
    val pairs = docShingles(docs)
    val first = pairs.groupBy(col("sh"))
      .agg(min(col("doc_id")).as("__first_doc"))
    pairs.join(first, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_shingles").cast("double"))
          .as("novelty"))
      .orderBy(col("doc_id").asc)
  }

  private[graft] def sourceRedundancy(docs: DataFrame): DataFrame =
    docShingles(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        countDistinct(col("sh")).as("n_unique"))
      .select(col("source"), col("n_docs"), col("n_occurrences"),
        col("n_unique"),
        ((col("n_occurrences") - col("n_unique")).cast("double") /
          col("n_occurrences").cast("double")).as("redundancy"))
      .orderBy(col("source").asc)

  val defs: Map[String, Q] = Map(
    "q_novelty" -> ((s, dir) => novelty(Tables.documents(s, dir))),
    "q_source_redundancy" -> ((s, dir) =>
      sourceRedundancy(Tables.documents(s, dir))))

  private val pairsSql =
    s"""p AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(${Extensions.sqlShingleSet("text", NovShingleLen)}) AS sh
       |  FROM documents)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_novelty" ->
      s"""WITH $pairsSql,
         |fo AS (SELECT sh, min(doc_id) AS first_doc FROM p GROUP BY sh)
         |SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(CASE WHEN fo.first_doc = p.doc_id THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_novel,
         |  CAST(sum(CASE WHEN fo.first_doc = p.doc_id THEN 1 ELSE 0 END)
         |      AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS novelty
         |FROM p JOIN fo USING (sh)
         |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin,

    "q_source_redundancy" ->
      s"""WITH $pairsSql
         |SELECT d.source, CAST(count(DISTINCT p.doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_occurrences,
         |  CAST(count(DISTINCT p.sh) AS BIGINT) AS n_unique,
         |  CAST(count(*) - count(DISTINCT p.sh) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS redundancy
         |FROM p JOIN documents d USING (doc_id)
         |GROUP BY d.source ORDER BY d.source""".stripMargin)
}
