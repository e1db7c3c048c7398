package graft.queries

import graft.Tables
import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hundred-sixty-seventh wave — VOCABULARY RICHNESS estimation: how
  * many token types exist that the corpus has NOT shown yet? The
  * question behind dedup budgeting, tokenizer sizing, and "is more
  * crawl worth it" — answered by the two classical estimators plus a
  * two-sample cross-check:
  *
  *  - **q_vocab_richness**: the frequency-spectrum estimators — Chao1
  *    richness V + f₁(f₁−1)/(2(f₂+1)) (bias-corrected) from the
  *    singleton/doubleton counts, and the Good–Turing unseen-mass
  *    estimate f₁/N with its complement (Turing coverage), next to
  *    the observed type/token counts.
  *  - **q_capture_recapture**: the Chapman estimator — treat even- and
  *    odd-doc vocabularies as two capture samples; N̂ =
  *    (n₁+1)(n₂+1)/(m+1) − 1 from the overlap m, emitted against the
  *    TRUE pooled vocabulary (computable at gate SF) with the realized
  *    relative error.
  *
  * Exact-parity discipline: the spectrum is integer counts over the
  * house tokenizer (norm → whitespace split, oracle twin
  * regexp-identical); every estimator is integer products with ONE
  * double division (f₁² ≤ V² ≈ 1e10 at sf0.1 — int64 headroom to
  * V ≈ 3e9 types); no transcendentals anywhere.
  *
  * Scale shape: one explode → two hash aggregates (token counts, then
  * the spectrum) — the classic map-side-combinable shape; the
  * capture-recapture needs per-token even/odd presence flags, a
  * boolean OR-aggregate on the same token shuffle. Nothing quadratic,
  * no windows.
  */
object Breadth166 {

  /** Frequency-spectrum richness estimators. */
  private[graft] def vocabRichness(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("__c"))
    counts.agg(
        sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("__c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("n_tokens"), col("vocab"), col("f1"), col("f2"),
        (col("vocab").cast("double") +
          (col("f1") * (col("f1") - 1)).cast("double") /
            (lit(2L) * (col("f2") + 1)).cast("double")).as("chao1"),
        (col("f1").cast("double") / col("n_tokens").cast("double"))
          .as("gt_unseen_mass"),
        (lit(1.0) - col("f1").cast("double") /
          col("n_tokens").cast("double")).as("turing_coverage"))
  }

  /** Chapman capture-recapture from the even/odd doc split. */
  private[graft] def captureRecapture(docs: DataFrame): DataFrame =
    docs
      .select((col("doc_id") % 2 === 0).as("__even"),
        explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(max(when(col("__even"), 1L).otherwise(0L)).as("__a"),
        max(when(!col("__even"), 1L).otherwise(0L)).as("__b"))
      .agg(sum(col("__a")).as("n1"), sum(col("__b")).as("n2"),
        sum(col("__a") * col("__b")).as("m"),
        count(lit(1)).as("vocab_true"))
      .select(col("n1"), col("n2"), col("m"), col("vocab_true"),
        (((col("n1") + 1) * (col("n2") + 1)).cast("double") /
          (col("m") + 1).cast("double") - lit(1.0)).as("chapman"))
      .withColumn("rel_err",
        (col("chapman") - col("vocab_true").cast("double")) /
          col("vocab_true").cast("double"))

  val defs: Map[String, Q] = Map(
    "q_vocab_richness" -> ((s, dir) =>
      vocabRichness(Tables.documents(s, dir))),
    "q_capture_recapture" -> ((s, dir) =>
      captureRecapture(Tables.documents(s, dir))))

  private def TokSql: String =
    s"SELECT unnest(${Extensions.sqlTokens("text")}) AS tok, doc_id " +
      "FROM documents"

  val oracle: Map[String, String] = Map(
    "q_vocab_richness" ->
      s"""WITH toks AS ($TokSql),
         |cnt AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS c
         |  FROM toks GROUP BY tok),
         |sp AS (
         |  SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS vocab,
         |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
         |  FROM cnt)
         |SELECT n_tokens, vocab, f1, f2,
         |  CAST(vocab AS DOUBLE) + CAST(f1 * (f1 - 1) AS DOUBLE)
         |    / CAST(2 * (f2 + 1) AS DOUBLE) AS chao1,
         |  CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)
         |    AS gt_unseen_mass,
         |  1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)
         |    AS turing_coverage
         |FROM sp""".stripMargin,

    "q_capture_recapture" ->
      s"""WITH toks AS ($TokSql),
         |pres AS (
         |  SELECT tok,
         |    CAST(max(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS a,
         |    CAST(max(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b
         |  FROM toks GROUP BY tok),
         |ag AS (
         |  SELECT CAST(sum(a) AS BIGINT) AS n1,
         |    CAST(sum(b) AS BIGINT) AS n2,
         |    CAST(sum(a * b) AS BIGINT) AS m,
         |    CAST(count(*) AS BIGINT) AS vocab_true
         |  FROM pres)
         |SELECT n1, n2, m, vocab_true,
         |  CAST((n1 + 1) * (n2 + 1) AS DOUBLE) / CAST(m + 1 AS DOUBLE)
         |    - 1.0 AS chapman,
         |  (CAST((n1 + 1) * (n2 + 1) AS DOUBLE) / CAST(m + 1 AS DOUBLE)
         |    - 1.0 - CAST(vocab_true AS DOUBLE))
         |    / CAST(vocab_true AS DOUBLE) AS rel_err
         |FROM ag""".stripMargin)
}
