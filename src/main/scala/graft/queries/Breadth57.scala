package graft.queries

import graft.Tables
import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fifty-eighth wave — classifier evaluation of the language-ID
  * heuristic against the corpus's ground-truth labels.
  *
  * q_lang_id emits predictions; a pipeline owner needs to know WHERE
  * the classifier is wrong before trusting it to route documents:
  *
  *  - **q_lang_confusion**: the (true lang × predicted lang) count
  *    matrix with the diagonal flagged — which confusions actually
  *    happen, not just how many.
  *  - **q_lang_prf**: per language code appearing as truth or
  *    prediction: support, predicted count, correct count, precision
  *    and recall (integer counts, one division each; a code never
  *    predicted gets null precision rather than 0/0).
  *
  * Both reuse `Text.langId` verbatim; the oracles reuse the SHARED
  * langPredSql chain, so engine and oracle state one heuristic. Scale
  * shape: one map-only prediction pass + |langs|²-bounded aggregates. */
object Breadth57 {

  private def preds(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      Text.langId(col("text")).as("pred_lang"))

  private[graft] def langConfusion(docs: DataFrame): DataFrame =
    preds(docs)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("is_correct", col("lang") === col("pred_lang"))
      .orderBy(col("lang").asc, col("pred_lang").asc)

  private[graft] def langPrf(docs: DataFrame): DataFrame = {
    val p = preds(docs)
    val truth = p.groupBy(col("lang").as("code"))
      .agg(count(lit(1)).as("n_true"))
    val predicted = p.groupBy(col("pred_lang").as("code"))
      .agg(count(lit(1)).as("n_pred"))
    val correct = p.filter(col("lang") === col("pred_lang"))
      .groupBy(col("lang").as("code"))
      .agg(count(lit(1)).as("n_correct"))
    truth.join(predicted, Seq("code"), "full_outer")
      .join(correct, Seq("code"), "left")
      .select(col("code"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("n_correct"), lit(0L)).as("n_correct"))
      .withColumn("precision",
        when(col("n_pred") > 0,
          col("n_correct").cast("double") / col("n_pred").cast("double")))
      .withColumn("recall",
        when(col("n_true") > 0,
          col("n_correct").cast("double") / col("n_true").cast("double")))
      .orderBy(col("code").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_lang_confusion" -> ((s, dir) =>
      langConfusion(Tables.documents(s, dir))),
    "q_lang_prf" -> ((s, dir) => langPrf(Tables.documents(s, dir))))

  val oracle: Map[String, String] = Map(
    "q_lang_confusion" ->
      s"""WITH ${Extensions.langPredSql}
         |SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  lang = pred_lang AS is_correct
         |FROM pred GROUP BY lang, pred_lang
         |ORDER BY lang, pred_lang""".stripMargin,

    "q_lang_prf" ->
      s"""WITH ${Extensions.langPredSql},
         |tr AS (SELECT lang AS code, CAST(count(*) AS BIGINT) AS n_true
         |  FROM pred GROUP BY lang),
         |pr AS (SELECT pred_lang AS code, CAST(count(*) AS BIGINT) AS n_pred
         |  FROM pred GROUP BY pred_lang),
         |co AS (SELECT lang AS code, CAST(count(*) AS BIGINT) AS n_correct
         |  FROM pred WHERE lang = pred_lang GROUP BY lang)
         |SELECT code,
         |  coalesce(tr.n_true, 0) AS n_true,
         |  coalesce(pr.n_pred, 0) AS n_pred,
         |  coalesce(co.n_correct, 0) AS n_correct,
         |  CASE WHEN coalesce(pr.n_pred, 0) > 0 THEN
         |    CAST(coalesce(co.n_correct, 0) AS DOUBLE)
         |      / CAST(coalesce(pr.n_pred, 0) AS DOUBLE) END AS precision,
         |  CASE WHEN coalesce(tr.n_true, 0) > 0 THEN
         |    CAST(coalesce(co.n_correct, 0) AS DOUBLE)
         |      / CAST(coalesce(tr.n_true, 0) AS DOUBLE) END AS recall
         |FROM tr FULL OUTER JOIN pr USING (code)
         |LEFT JOIN co USING (code)
         |ORDER BY code""".stripMargin)
}
