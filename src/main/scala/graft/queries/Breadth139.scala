package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-fortieth wave — Kneser–Ney smoothed bigram language model
  * scoring with a scale-invariant perplexity gate: the CCNet-style
  * "train a small LM on the corpus, keep documents whose perplexity
  * beats the corpus average" filter, the classic LLM-pretraining
  * quality screen (the interpolated-backoff q_bigram_lm's production
  * sibling — KN replaces raw unigram backoff with CONTINUATION
  * counts, so versatile tokens back off high and burst-frequency
  * tokens don't).
  *
  * Model (absolute discount D = 0.75, binary-exact):
  *   P(w₂|w₁) = (c₁₂ − D)/c(w₁·) + (D·N₁₊(w₁·)/c(w₁·)) · Pcont(w₂)
  *   Pcont(w₂) = N₁₊(·w₂) / N₁₊(··)
  * where c(w₁·) sums bigram counts left-wards and the N₁₊ are distinct
  * bigram-type counts. Every scored bigram exists in the corpus
  * (self-scoring), so c₁₂ ≥ 1 > D and the max(·,0) clamp is vacuous.
  *
  * Exact-parity discipline: each bigram's log₂P is quantized to
  * integer 1e-6 units (floor) BEFORE the per-doc sum (the q_bigram_lm
  * convention, measured libm-clean at sf0.1); P itself is ONE
  * identical-operand double expression over exact integers in both
  * engines. The gate avoids doubles entirely: keep ⟺ doc micro-mean ≥
  * corpus micro-mean ⟺ s_i·N ≥ n_i·S by integer cross-multiplication
  * (N = Σn, S = Σs; both multipliers positive so the inequality is
  * exact). Int64 headroom: |s_i| ≤ n_i·30e6 and |s_i·N| wraps past
  * N ≈ 3e11 corpus bigrams at n_i = 1000 — past that, right-shift both
  * sides k bits (div is order-preserving on same-sign operands) or run
  * the comparison in Decimal(38,0); the knob is documented here, not
  * needed at gate SFs.
  *
  * Scale shape: two hash-aggregate passes build the model (bigram type
  * counts, then left/right marginals — all map-side-combinable), the
  * scoring pass joins the bigram stream to three vocabulary-sized
  * count tables (AQE broadcasts them when they fit; at 100 TB they
  * shuffle-join on w1/w2 with the bigram stream already partitioned),
  * the gate is one broadcast of a single-row aggregate. No quadratic
  * path, no driver state.
  */
object Breadth139 {

  private[graft] val KnDiscount = 0.75

  /** Per-document KN bigram log-likelihood + the corpus-mean gate. */
  private[graft] def knScores(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(graft.text.Text.tokens(col("text"))).as(Seq("pos", "tok")))
    val seq = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    val bigrams = toks
      .withColumn("__w2", lead(col("tok"), 1).over(seq))
      .filter(col("__w2").isNotNull)
      .select(col("doc_id"), col("tok").as("w1"), col("__w2").as("w2"))
    val bc = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val left = bc.groupBy(col("w1"))
      .agg(sum(col("c12")).as("__c1dot"), count(lit(1)).as("__n1w1"))
    val right = bc.groupBy(col("w2")).agg(count(lit(1)).as("__n1w2"))
    val scal = bc.agg(count(lit(1)).as("__nall"))
    val p = (col("c12").cast("double") - lit(KnDiscount))
      .divide(col("__c1dot").cast("double"))
      .plus((lit(KnDiscount) * col("__n1w1").cast("double")
          / col("__c1dot").cast("double"))
        * (col("__n1w2").cast("double") / col("__nall").cast("double")))
    val perDoc = bigrams
      .join(bc, Seq("w1", "w2"))
      .join(left, Seq("w1"))
      .join(right, Seq("w2"))
      .crossJoin(broadcast(scal))
      .select(col("doc_id"),
        floor(lit(1.0e6) * log2(p)).cast("long").as("__lpq"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lpq")).as("sum_lp_q"))
    val tot = perDoc.agg(sum(col("n_bigrams")).as("__tn"),
      sum(col("sum_lp_q")).as("__ts"))
    perDoc.crossJoin(broadcast(tot))
      .select(col("doc_id"), col("n_bigrams"), col("sum_lp_q"),
        (col("sum_lp_q").cast("double") / col("n_bigrams").cast("double")
          / lit(1.0e6)).as("avg_log2p"),
        (col("sum_lp_q") * col("__tn") >= col("n_bigrams") * col("__ts"))
          .as("keep"))
  }

  private[graft] val ContTopN = 20

  /** The KN continuation-probability head: tokens ranked by how many
    * DISTINCT left contexts they follow (versatility, not frequency) —
    * the quantity KN backs off to. Ties break token-ascending. */
  private[graft] def knContinuation(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(graft.text.Text.tokens(col("text"))).as(Seq("pos", "tok")))
    val seq = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    val bc = toks
      .withColumn("__w2", lead(col("tok"), 1).over(seq))
      .filter(col("__w2").isNotNull)
      .select(col("tok").as("w1"), col("__w2").as("w2"))
      .distinct()
    val scal = bc.agg(count(lit(1)).as("__nall"))
    val ranked = bc.groupBy(col("w2").as("tok"))
      .agg(count(lit(1)).as("cont_count"))
      .crossJoin(broadcast(scal))
      .select(col("tok"), col("cont_count"),
        (col("cont_count").cast("double") / col("__nall").cast("double"))
          .as("p_cont"))
      .orderBy(col("cont_count").desc, col("tok").asc)
      .limit(ContTopN)
    ranked.withColumn("rank", row_number().over(
        Window.orderBy(col("cont_count").desc, col("tok").asc)).cast("long"))
      .select(col("rank"), col("tok"), col("cont_count"), col("p_cont"))
      .orderBy(col("rank").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_kneser_ney" -> ((s, dir) =>
      knScores(Tables.documents(s, dir)).orderBy(col("doc_id").asc)),
    "q_kn_continuation" -> ((s, dir) =>
      knContinuation(Tables.documents(s, dir))))

  /** Token + bigram-count CTE chain (no leading WITH), shared by both
    * oracles. */
  private val BigramSql: String =
    s"""toks AS (
       |  SELECT doc_id, unnest(${Extensions.sqlTokens("text")}) AS tok,
       |    unnest(range(1, len(${Extensions.sqlTokens("text")}) + 1)) AS pos
       |  FROM documents),
       |big AS (
       |  SELECT doc_id, tok AS w1,
       |    lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
       |  FROM toks),
       |b2 AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
       |bc AS (
       |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
       |  FROM b2 GROUP BY w1, w2)""".stripMargin

  /** The full per-doc KN score + gate chain (no leading WITH): CTEs
    * through `pd` (doc_id, n_bigrams, sum_lp_q) and `tot` (tn, ts) —
    * shared with the pipeline-yield oracle (Breadth148). */
  private[queries] val KnChainSql: String =
    s"""$BigramSql,
       |lt AS (
       |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1dot,
       |    CAST(count(*) AS BIGINT) AS n1w1
       |  FROM bc GROUP BY w1),
       |rt AS (
       |  SELECT w2, CAST(count(*) AS BIGINT) AS n1w2
       |  FROM bc GROUP BY w2),
       |knscal AS (SELECT CAST(count(*) AS BIGINT) AS nall FROM bc),
       |lp AS (
       |  SELECT b.doc_id,
       |    CAST(floor(1.0e6 * log2(
       |      (CAST(bc.c12 AS DOUBLE) - 0.75) / CAST(lt.c1dot AS DOUBLE)
       |      + (0.75 * CAST(lt.n1w1 AS DOUBLE) / CAST(lt.c1dot AS DOUBLE))
       |        * (CAST(rt.n1w2 AS DOUBLE) / CAST(s.nall AS DOUBLE))))
       |      AS BIGINT) AS lpq
       |  FROM b2 b
       |  JOIN bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
       |  JOIN lt ON b.w1 = lt.w1
       |  JOIN rt ON b.w2 = rt.w2
       |  CROSS JOIN knscal s),
       |pd AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(lpq) AS BIGINT) AS sum_lp_q
       |  FROM lp GROUP BY doc_id),
       |tot AS (
       |  SELECT CAST(sum(n_bigrams) AS BIGINT) AS tn,
       |    CAST(sum(sum_lp_q) AS BIGINT) AS ts
       |  FROM pd)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_kneser_ney" ->
      s"""WITH $KnChainSql
         |SELECT doc_id, n_bigrams, sum_lp_q,
         |  CAST(sum_lp_q AS DOUBLE) / CAST(n_bigrams AS DOUBLE) / 1.0e6
         |    AS avg_log2p,
         |  sum_lp_q * tn >= n_bigrams * ts AS keep
         |FROM pd CROSS JOIN tot
         |ORDER BY doc_id""".stripMargin,

    "q_kn_continuation" ->
      s"""WITH $BigramSql,
         |bt AS (SELECT DISTINCT w1, w2 FROM b2),
         |scal AS (SELECT CAST(count(*) AS BIGINT) AS nall FROM bt),
         |ct AS (
         |  SELECT w2 AS tok, CAST(count(*) AS BIGINT) AS cont_count
         |  FROM bt GROUP BY w2)
         |SELECT CAST(row_number() OVER (
         |    ORDER BY cont_count DESC, tok) AS BIGINT) AS rank,
         |  tok, cont_count,
         |  CAST(cont_count AS DOUBLE) / CAST(nall AS DOUBLE) AS p_cont
         |FROM ct CROSS JOIN scal
         |ORDER BY cont_count DESC, tok
         |LIMIT $ContTopN""".stripMargin)
}
