package graft.queries

import graft.Tables
import graft.sim.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-forty-fourth wave — margin-based BITEXT MINING over the
  * embedding corpus: the LASER/CCMatrix parallel-pair miner. Two
  * language shores (en / de documents, embeddings joined on
  * vec_id = doc_id), each vector retrieves its nearest neighbours on
  * the other shore, and a pair is emitted when it is the MUTUAL best
  * match; pairs are scored by the Artetxe–Schwenk ratio margin
  *   margin(x,y) = cos(x,y) / ((avgₖ(x) + avgₖ(y)) / 2),  k = 4,
  * where avgₖ is the mean of the vector's top-k cross-shore cosines —
  * the score that separates true translations from hubs (a hub's high
  * cosine is discounted by its equally-high neighbourhood).
  *
  * Exact-parity discipline: every cosine is the 6-dp-rounded shared
  * fold (the Breadth43 convention; ties break neighbour-id-ascending),
  * the top-4 average is Σ4/4 of those rounded values, and the margin
  * is ONE identical-operand double expression — both engines see
  * bit-equal doubles, so margin is safe to sort on (id tie-break).
  *
  * Scale shape: the gate-SF build is the bipartite brute-force scan
  * (|en|·|de| cosines — the q_embed_topk stance); at 100 TB the
  * candidate generation swaps to the IVF/PQ shortlist
  * (sim/Ivf.exactKnnDirected cells on the union corpus, or the PQ ADC
  * table of Breadth121) with exact re-rank of shortlist survivors —
  * the documented one-function swap; margins only ever read each
  * side's top-4, which any shortlist ≥ 4 preserves. Windows partition
  * by vector id (bounded groups, no global sort); the mutual filter
  * is an equi-join on the pair key.
  */
object Breadth143 {

  private[graft] val MarginK = 4
  private[graft] val MarginTopN = 15
  private[graft] val LangA = "en"
  private[graft] val LangB = "de"

  /** Embeddings of one language shore: (id, v). */
  private[graft] def shore(emb: DataFrame, docs: DataFrame,
                           lang: String): DataFrame =
    emb.join(docs.filter(col("lang") === lang)
        .select(col("doc_id").as("vec_id")), Seq("vec_id"))
      .select(col("vec_id"), col("embedding"))

  /** All cross-shore cosines (id_a from A, id_b from B, cos 6dp). */
  private[graft] def crossCos(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("vec_id").as("id_a"), col("embedding").as("__va"))
      .crossJoin(b.select(col("vec_id").as("id_b"),
        col("embedding").as("__vb")))
      .select(col("id_a"), col("id_b"),
        round(Similarity.cosine(col("__va"), col("__vb")), 6).as("cos"))

  /** Per-source-vector retrieval stats over `pairs` keyed by keyCol:
    * top-1 target + cos and the top-k cosine average. */
  private[graft] def retrievalStats(pairs: DataFrame, keyCol: String,
                                    tgtCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("cos").desc, col(tgtCol).asc)
    pairs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= MarginK)
      .groupBy(col(keyCol))
      .agg(
        max(when(col("__rn") === 1,
          struct(col(tgtCol), col("cos")))).as("__top"),
        sum(floor(col("cos") * lit(1.0e6) + lit(0.5)).cast("long"))
          .as("__sumq"))
      .select(col(keyCol), col("__top").getField(tgtCol).as("__best"),
        col("__top").getField("cos").as("__bcos"), col("__sumq"))
  }

  /** Mutual best-match pairs with the ratio margin. */
  private[graft] def bitextMine(emb: DataFrame, docs: DataFrame): DataFrame = {
    val pairs = crossCos(shore(emb, docs, LangA), shore(emb, docs, LangB))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fwd = retrievalStats(pairs, "id_a", "id_b")
      .select(col("id_a").as("__src_en"), col("__best").as("__best_de"),
        col("__bcos").as("__bcos_en"), col("__sumq").as("__sumq_en"))
    val rev = retrievalStats(pairs, "id_b", "id_a")
      .select(col("id_b").as("__src_de"), col("__best").as("__best_en"),
        col("__sumq").as("__sumq_de"))
    fwd.join(rev, col("__best_de") === col("__src_de")
        && col("__best_en") === col("__src_en"))
      .select(col("__src_en").as("id_en"), col("__src_de").as("id_de"),
        col("__bcos_en").as("cos"),
        (col("__bcos_en")
          / ((col("__sumq_en") + col("__sumq_de")).cast("double")
            / lit(2.0e6 * MarginK))).as("margin"))
      .orderBy(col("id_en").asc)
  }

  /** The retrieval-then-filter stage: every en vector's best de match
    * ranked by margin, top-15. */
  private[graft] def bitextMargin(emb: DataFrame,
                                  docs: DataFrame): DataFrame = {
    val pairs = crossCos(shore(emb, docs, LangA), shore(emb, docs, LangB))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fwd = retrievalStats(pairs, "id_a", "id_b")
      .select(col("id_a").as("__src_en"), col("__best").as("__best_de"),
        col("__bcos").as("__bcos_en"), col("__sumq").as("__sumq_en"))
    val rev = retrievalStats(pairs, "id_b", "id_a")
      .select(col("id_b").as("__src_de"), col("__sumq").as("__sumq_de"))
    val scored = fwd.join(rev, col("__best_de") === col("__src_de"))
      .select(col("__src_en").as("id_en"), col("__src_de").as("id_de"),
        col("__bcos_en").as("cos"),
        (col("__bcos_en")
          / ((col("__sumq_en") + col("__sumq_de")).cast("double")
            / lit(2.0e6 * MarginK))).as("margin"))
      .orderBy(col("margin").desc, col("id_en").asc)
      .limit(MarginTopN)
    scored.withColumn("rank", row_number().over(
        Window.orderBy(col("margin").desc, col("id_en").asc)).cast("long"))
      .select(col("rank"), col("id_en"), col("id_de"), col("cos"),
        col("margin"))
      .orderBy(col("rank").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_bitext_mine" -> ((s, dir) =>
      bitextMine(Tables.embeddings(s, dir), Tables.documents(s, dir))),
    "q_bitext_margin" -> ((s, dir) =>
      bitextMargin(Tables.embeddings(s, dir), Tables.documents(s, dir))))

  /** Cross-shore cosine + per-side retrieval CTE chain. */
  private val BitextSql: String =
    s"""ea AS (
       |  SELECT e.vec_id AS id_a, CAST(e.embedding AS DOUBLE[]) AS v
       |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
       |  WHERE d.lang = '$LangA'),
       |eb AS (
       |  SELECT e.vec_id AS id_b, CAST(e.embedding AS DOUBLE[]) AS v
       |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
       |  WHERE d.lang = '$LangB'),
       |pairs AS (
       |  SELECT a.id_a, b.id_b,
       |    round(list_dot_product(a.v, b.v)
       |      / (sqrt(list_dot_product(a.v, a.v))
       |        * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
       |  FROM ea a CROSS JOIN eb b),
       |fwd AS (
       |  SELECT id_a,
       |    max(CASE WHEN rn = 1 THEN id_b END) AS best,
       |    max(CASE WHEN rn = 1 THEN cos END) AS bcos,
       |    CAST(sum(CAST(floor(cos * 1.0e6 + 0.5) AS BIGINT)) AS BIGINT)
       |      AS sumq
       |  FROM (SELECT id_a, id_b, cos,
       |          row_number() OVER (PARTITION BY id_a
       |            ORDER BY cos DESC, id_b) AS rn
       |        FROM pairs)
       |  WHERE rn <= $MarginK
       |  GROUP BY id_a),
       |rev AS (
       |  SELECT id_b,
       |    max(CASE WHEN rn = 1 THEN id_a END) AS best,
       |    max(CASE WHEN rn = 1 THEN cos END) AS bcos,
       |    CAST(sum(CAST(floor(cos * 1.0e6 + 0.5) AS BIGINT)) AS BIGINT)
       |      AS sumq
       |  FROM (SELECT id_a, id_b, cos,
       |          row_number() OVER (PARTITION BY id_b
       |            ORDER BY cos DESC, id_a) AS rn
       |        FROM pairs)
       |  WHERE rn <= $MarginK
       |  GROUP BY id_b)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_bitext_mine" ->
      s"""WITH $BitextSql
         |SELECT f.id_a AS id_en, r.id_b AS id_de, f.bcos AS cos,
         |  f.bcos / (CAST(f.sumq + r.sumq AS DOUBLE)
         |    / ${2.0e6 * MarginK}) AS margin
         |FROM fwd f JOIN rev r ON f.best = r.id_b AND r.best = f.id_a
         |ORDER BY id_en""".stripMargin,

    "q_bitext_margin" ->
      s"""WITH $BitextSql,
         |scored AS (
         |  SELECT f.id_a AS id_en, f.best AS id_de, f.bcos AS cos,
         |    f.bcos / (CAST(f.sumq + r.sumq AS DOUBLE)
         |      / ${2.0e6 * MarginK}) AS margin
         |  FROM fwd f JOIN rev r ON f.best = r.id_b)
         |SELECT CAST(row_number() OVER (
         |    ORDER BY margin DESC, id_en) AS BIGINT) AS rank,
         |  id_en, id_de, cos, margin
         |FROM scored
         |ORDER BY margin DESC, id_en
         |LIMIT $MarginTopN""".stripMargin)
}
