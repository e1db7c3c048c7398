package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-thirty-sixth wave — **q_gumbel_topk**: the SAMPLING step
  * that turns the DSIR importance weights into a training subset —
  * the Gumbel-top-k trick: adding an independent Gumbel(0,1) draw
  * g = −ln(−ln(u)) to each document's log-weight and taking the top-k
  * samples WITHOUT replacement from the softmax distribution the
  * weights define. Draws are RNG-free md5 uniforms of (doc_id, tag);
  * the sampling key rounds to 6 dp on BOTH engines before ranking
  * (the documented libm 1-ulp stance — ln twice per draw), with
  * doc_id breaking residual ties.
  *
  * Scale shape: the weight table is the q_dsir |vocab|-bounded chain;
  * sampling adds one per-doc expression and a top-k
  * (TakeOrderedAndProject at the end), nothing quadratic. */
object Breadth135 {

  private val TopK = 20
  private val Tag = "gumbelv1"
  private val TwoPow60 = 1152921504606846976L

  /** Gumbel draw from the md5 uniform of (doc, tag). */
  private def gumbel(idc: Column): Column = {
    val h = conv(substring(md5(concat_ws("#", idc.cast("string"),
      lit(Tag))), 1, 15), 16, 10).cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(TwoPow60).cast("double")
    -log(-log(u))
  }

  private[graft] def gumbelTopK(docs: DataFrame,
                                targetLang: String = "en",
                                k: Int = TopK): DataFrame = {
    val w = Extensions12.dsirWeights(docs, targetLang)
    val keyed = w.withColumn("sample_key",
      round(col("dsir_w") + gumbel(col("doc_id")), 6))
    val ord = Window.orderBy(col("sample_key").desc, col("doc_id").asc)
    keyed.withColumn("pick", row_number().over(ord))
      .filter(col("pick") <= k)
      .select(col("pick"), col("doc_id"), col("lang"), col("n_tokens"),
        col("dsir_w"), col("sample_key"))
      .orderBy(col("pick").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_gumbel_topk" -> ((s, dir) =>
      gumbelTopK(Tables.documents(s, dir))))

  val oracle: Map[String, String] = Map(
    "q_gumbel_topk" ->
      s"""WITH tok AS (
         |  SELECT doc_id, lang, unnest(${Extensions.sqlTokens("text")}) AS tok
         |  FROM documents),
         |dt AS (
         |  SELECT doc_id, lang, tok, count(*) AS c
         |  FROM tok GROUP BY 1, 2, 3),
         |cs AS (SELECT tok, count(*) AS cs FROM tok GROUP BY tok),
         |ct AS (SELECT tok, count(*) AS ct FROM tok WHERE lang = 'en'
         |  GROUP BY tok),
         |m AS (SELECT CAST(sum(cs) AS BIGINT) AS ns,
         |    CAST(count(*) AS BIGINT) AS v FROM cs),
         |mt AS (SELECT CAST(sum(ct) AS BIGINT) AS nt FROM ct),
         |term AS (
         |  SELECT cs.tok,
         |    ln((CAST(coalesce(ct.ct, 0) + 1 AS DOUBLE) / (mt.nt + m.v))
         |      / (CAST(cs.cs + 1 AS DOUBLE) / (m.ns + m.v))) AS w
         |  FROM cs LEFT JOIN ct USING (tok), m, mt),
         |dw AS (
         |  SELECT dt.doc_id, dt.lang,
         |    CAST(sum(dt.c) AS BIGINT) AS n_tokens,
         |    round(sum(dt.c * t.w), 4) AS dsir_w
         |  FROM dt JOIN term t USING (tok)
         |  GROUP BY dt.doc_id, dt.lang),
         |keyed AS (
         |  SELECT doc_id, lang, n_tokens, dsir_w,
         |    round(dsir_w + (-ln(-ln(
         |      (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
         |        || '#$Tag'), 1, 15))::BIGINT AS DOUBLE) + 0.5)
         |      / CAST($TwoPow60 AS DOUBLE)))), 6) AS sample_key
         |  FROM dw),
         |rk AS (
         |  SELECT *, CAST(row_number() OVER (
         |    ORDER BY sample_key DESC, doc_id) AS INTEGER) AS pick
         |  FROM keyed)
         |SELECT pick, doc_id, lang, n_tokens, dsir_w, sample_key
         |FROM rk WHERE pick <= $TopK
         |ORDER BY pick""".stripMargin)
}
