package graft.queries

import graft.Tables
import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fifty-fourth wave — the composite quality-rules gate (the
  * Gopher/C4-style document filter as ONE auditable pass).
  *
  *  - **q_gopher_rules**: per document, the four rule verdicts and the
  *    composite keep flag — too short (<20 tokens), too long (>90),
  *    degenerate mean word length (outside [4, 10] — stated as the
  *    INTEGER cross-multiplication sumLen < 4·n / sumLen > 10·n, no
  *    division), dominant-token repetition (top token ≥ 20% of the
  *    doc, again cross-multiplied). Every rule is an exact integer
  *    predicate over one token-frequency aggregate.
  *  - **q_rule_attrition**: the audit view a pipeline owner reads —
  *    per rule, how many documents it fired on and for how many it was
  *    the SOLE reason (the marginal rule value; a rule with zero sole
  *    rejections is redundant and can be dropped without changing the
  *    kept set).
  *
  * Scale shape: one token explode + one (doc, token) aggregate + one
  * per-doc rollup — map-side combinable, |vocab|-free; the attrition
  * view is a 4-row aggregate over the rule table. Thresholds are
  * data-sized to this corpus (token counts 10–99); production swaps
  * the constants, not the shape. */
object Breadth53 {

  private[graft] val MinTokens = 20
  private[graft] val MaxTokens = 90
  private[graft] val MinMeanLen = 4L // ×n cross-multiplied
  private[graft] val MaxMeanLen = 10L
  private[graft] val RepeatDen = 5 // top token ≥ 1/5 of tokens

  /** Per-doc rule verdicts over one token-frequency pass. */
  private[graft] def ruleTable(docs: DataFrame): DataFrame = {
    val tf = docs.select(col("doc_id"),
        explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("__c"))
    val perDoc = tf.groupBy(col("doc_id"))
      .agg(sum(col("__c")).as("n_tokens"),
        max(col("__c")).as("__mx"),
        sum(length(col("tok")) * col("__c")).as("__sum_len"))
    perDoc.select(col("doc_id"), col("n_tokens"),
      (col("n_tokens") < MinTokens).as("r_short"),
      (col("n_tokens") > MaxTokens).as("r_long"),
      (col("__sum_len") < lit(MinMeanLen) * col("n_tokens") ||
        col("__sum_len") > lit(MaxMeanLen) * col("n_tokens"))
        .as("r_word_len"),
      (col("__mx") * lit(RepeatDen.toLong) >= col("n_tokens"))
        .as("r_repeat"))
      .withColumn("keep",
        !col("r_short") && !col("r_long") && !col("r_word_len") &&
          !col("r_repeat"))
  }

  private[graft] def ruleAttrition(rules: DataFrame): DataFrame = {
    val names = Seq("r_short", "r_long", "r_word_len", "r_repeat")
    names.map { r =>
      val others = names.filterNot(_ == r)
        .map(col(_)).reduce(_ || _)
      rules.agg(
        sum(when(col(r), 1L).otherwise(0L)).as("n_fired"),
        sum(when(col(r) && !others, 1L).otherwise(0L)).as("n_sole_reason"))
        .select(lit(r).as("rule"), col("n_fired"), col("n_sole_reason"))
    }.reduce(_ unionAll _).orderBy(col("rule").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_gopher_rules" -> ((s, dir) =>
      ruleTable(Tables.documents(s, dir)).orderBy(col("doc_id").asc)),
    "q_rule_attrition" -> ((s, dir) =>
      ruleAttrition(ruleTable(Tables.documents(s, dir)))))

  private val rulesSql =
    s"""toks AS (
       |  SELECT doc_id, unnest(${Extensions.sqlTokens("text")}) AS tok
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
       |pd AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       |    CAST(max(c) AS BIGINT) AS mx,
       |    CAST(sum(length(tok) * c) AS BIGINT) AS sum_len
       |  FROM tf GROUP BY doc_id),
       |rules AS (
       |  SELECT doc_id, n_tokens,
       |    n_tokens < $MinTokens AS r_short,
       |    n_tokens > $MaxTokens AS r_long,
       |    sum_len < $MinMeanLen * n_tokens
       |      OR sum_len > $MaxMeanLen * n_tokens AS r_word_len,
       |    mx * $RepeatDen >= n_tokens AS r_repeat
       |  FROM pd)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_gopher_rules" ->
      s"""WITH $rulesSql
         |SELECT doc_id, n_tokens, r_short, r_long, r_word_len, r_repeat,
         |  NOT r_short AND NOT r_long AND NOT r_word_len AND NOT r_repeat
         |    AS keep
         |FROM rules ORDER BY doc_id""".stripMargin,

    "q_rule_attrition" ->
      s"""WITH $rulesSql
         |SELECT 'r_long' AS rule,
         |  CAST(sum(CASE WHEN r_long THEN 1 ELSE 0 END) AS BIGINT) AS n_fired,
         |  CAST(sum(CASE WHEN r_long AND NOT (r_short OR r_word_len OR r_repeat)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_sole_reason
         |FROM rules
         |UNION ALL
         |SELECT 'r_repeat',
         |  CAST(sum(CASE WHEN r_repeat THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(sum(CASE WHEN r_repeat AND NOT (r_short OR r_long OR r_word_len)
         |    THEN 1 ELSE 0 END) AS BIGINT)
         |FROM rules
         |UNION ALL
         |SELECT 'r_short',
         |  CAST(sum(CASE WHEN r_short THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(sum(CASE WHEN r_short AND NOT (r_long OR r_word_len OR r_repeat)
         |    THEN 1 ELSE 0 END) AS BIGINT)
         |FROM rules
         |UNION ALL
         |SELECT 'r_word_len',
         |  CAST(sum(CASE WHEN r_word_len THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(sum(CASE WHEN r_word_len AND NOT (r_short OR r_long OR r_repeat)
         |    THEN 1 ELSE 0 END) AS BIGINT)
         |FROM rules
         |ORDER BY rule""".stripMargin)
}
