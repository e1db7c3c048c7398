package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hundred-fifty-eighth wave — t-CLOSENESS, the third leg of the
  * privacy-release audit (after wave 152's k-anonymity and
  * l-diversity): per QI equivalence class, how far the class's
  * sensitive-attribute (lang) distribution sits from the GLOBAL
  * distribution. l-diversity counts distinct secrets; t-closeness
  * catches the skewness attack l-diversity misses (a class can hold 3
  * distinct langs and still be 95% one lang that is 2% globally —
  * membership leaks the secret). Distance = total variation = EMD
  * under uniform ground distance on categories, the standard t for
  * categorical sensitive attributes.
  *
  *  - **q_t_closeness**: the one-row release verdict — dataset t (the
  *    MAXIMUM class TVD), class count, classes and row share above the
  *    0.25 disclosure line (TVD is already normalized to [0,1], so the
  *    threshold is scale-invariant by construction).
  *  - **q_t_worst_classes**: the top-10 classes by TVD — the audit
  *    worklist naming which (source, length-decile) cells to suppress
  *    or generalize first.
  *
  * Exact-parity discipline: TVD per class is computed as the exact
  * integer numerator Σ_v |cnt_cv·N − cnt_v·sz| (order-free BIGINT sum;
  * absent langs contribute cnt_v·sz via a class×lang grid left join)
  * over the denominator 2·sz·N, ONE double division at emit. Int64
  * headroom: |terms| ≤ N² ≈ 2.5e9 at sf0.1 and the per-class sum ≤
  * 2N² — overflow needs N ≈ 2·10⁹ rows.
  *
  * Scale shape: reuses wave 152's rank-decile QI classes (documented
  * approx_percentile swap at 100 TB); the TVD grid is |classes|·|langs|
  * rows — metadata-sized after the two hash aggregates; no new
  * corpus-scale shuffle beyond the QI groupBy.
  */
object Breadth157 {

  private[graft] val DiscloseTvd = 0.25
  private[graft] val WorstTopN = 10

  /** Per-class exact TVD vs the global lang distribution. */
  private[graft] def classTvd(docs: DataFrame): DataFrame = {
    val qi = Breadth151.qiClasses(docs)
    val cellCnt = qi.groupBy(col("source"), col("len_decile"), col("lang"))
      .agg(count(lit(1)).as("__cv"))
    val classSz = qi.groupBy(col("source"), col("len_decile"))
      .agg(count(lit(1)).as("sz"))
    val langCnt = qi.groupBy(col("lang")).agg(count(lit(1)).as("__gv"))
      .withColumnRenamed("lang", "__glang")
    val n = docs.agg(count(lit(1)).as("__n"))
    val grid = classSz.crossJoin(broadcast(langCnt))
      .join(cellCnt,
        cellCnt("source") === classSz("source") &&
          cellCnt("len_decile") === classSz("len_decile") &&
          cellCnt("lang") === col("__glang"),
        "left")
      .select(classSz("source"), classSz("len_decile"), col("sz"),
        col("__gv"), coalesce(col("__cv"), lit(0L)).as("__cv"))
      .crossJoin(broadcast(n))
    grid.groupBy(col("source"), col("len_decile"))
      .agg(first(col("sz")).as("sz"), first(col("__n")).as("__n"),
        sum(abs(col("__cv") * col("__n") - col("__gv") * col("sz")))
          .as("tvd_num"))
      .select(col("source"), col("len_decile"), col("sz"), col("tvd_num"),
        (col("tvd_num").cast("double") /
          (lit(2L) * col("sz") * col("__n")).cast("double")).as("tvd"))
  }

  /** One-row release verdict. */
  private[graft] def tCloseness(docs: DataFrame): DataFrame =
    classTvd(docs).agg(
      count(lit(1)).as("n_classes"),
      max(col("tvd")).as("t_closeness"),
      sum(when(col("tvd") > DiscloseTvd, 1L).otherwise(0L))
        .as("n_disclosing"),
      (sum(when(col("tvd") > DiscloseTvd, col("sz")).otherwise(0L))
        .cast("double") / sum(col("sz")).cast("double"))
        .as("disclosing_share"))

  /** Top-10 audit worklist by TVD (ties: source, decile asc). */
  private[graft] def tWorstClasses(docs: DataFrame): DataFrame =
    classTvd(docs)
      .orderBy(col("tvd").desc, col("source").asc, col("len_decile").asc)
      .limit(WorstTopN)
      .select(col("source"), col("len_decile"), col("sz"), col("tvd_num"),
        col("tvd"))

  val defs: Map[String, Q] = Map(
    "q_t_closeness" -> ((s, dir) => tCloseness(Tables.documents(s, dir))),
    "q_t_worst_classes" -> ((s, dir) =>
      tWorstClasses(Tables.documents(s, dir))))

  /** QI + TVD CTE chain (no leading WITH), shared. */
  private val TvdSql: String =
    s"""nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |qi AS (
       |  SELECT doc_id, source, lang,
       |    ((CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
       |      - 1) * 10) // nn.n AS len_decile
       |  FROM documents CROSS JOIN nn),
       |cs AS (
       |  SELECT source, len_decile, CAST(count(*) AS BIGINT) AS sz
       |  FROM qi GROUP BY source, len_decile),
       |cc AS (
       |  SELECT source, len_decile, lang, CAST(count(*) AS BIGINT) AS cv
       |  FROM qi GROUP BY source, len_decile, lang),
       |gl AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS gv FROM qi GROUP BY lang),
       |tv AS (
       |  SELECT cs.source, cs.len_decile, cs.sz,
       |    CAST(sum(abs(coalesce(cc.cv, 0) * nn.n - gl.gv * cs.sz))
       |      AS BIGINT) AS tvd_num,
       |    CAST(sum(abs(coalesce(cc.cv, 0) * nn.n - gl.gv * cs.sz))
       |        AS DOUBLE)
       |      / CAST(2 * cs.sz * nn.n AS DOUBLE) AS tvd
       |  FROM cs CROSS JOIN gl CROSS JOIN nn
       |  LEFT JOIN cc ON cc.source = cs.source
       |    AND cc.len_decile = cs.len_decile AND cc.lang = gl.lang
       |  GROUP BY cs.source, cs.len_decile, cs.sz, nn.n)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_t_closeness" ->
      s"""WITH $TvdSql
         |SELECT CAST(count(*) AS BIGINT) AS n_classes,
         |  max(tvd) AS t_closeness,
         |  CAST(sum(CASE WHEN tvd > $DiscloseTvd THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_disclosing,
         |  CAST(sum(CASE WHEN tvd > $DiscloseTvd THEN sz ELSE 0 END)
         |      AS DOUBLE)
         |    / CAST(sum(sz) AS DOUBLE) AS disclosing_share
         |FROM tv""".stripMargin,

    "q_t_worst_classes" ->
      s"""WITH $TvdSql
         |SELECT source, len_decile, sz, tvd_num, tvd
         |FROM tv
         |ORDER BY tvd DESC, source, len_decile
         |LIMIT $WorstTopN""".stripMargin)
}
