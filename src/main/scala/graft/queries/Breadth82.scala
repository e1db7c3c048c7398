package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Eighty-third wave — classical hypothesis tests as distributed
  * aggregates: one-way ANOVA, Cramér's V, Kruskal-Wallis.
  *
  *  - **q_anova_f**: one-way ANOVA F of document length across
  *    sources. Per-group n/Σx/Σx² are exact int64; the only float
  *    work is the ≤|groups| between-term sum, accumulated as an
  *    ORDERED running window sum (the q_chi2 discipline) so both
  *    engines add in the same order. Emitted stats are magnitude-O(1)
  *    ratios (F, η²) — never raw sums of squares, whose 1e9 magnitude
  *    would put window-sum ulp noise at the 6-dp rounding boundary.
  *  - **q_cramers_v**: effect size of the event-type × calendar-month
  *    association: χ² over the ≤|types|·12 contingency cells (ordered
  *    cell-sum), then V = √(χ² / (N·min(r−1, c−1))).
  *  - **q_kruskal**: Kruskal-Wallis H across sources on document
  *    length, tie-corrected — WITHOUT a global per-row rank. Lengths
  *    live in a small domain, so ranks derive from the |domain|-row
  *    value-count table: doubled average rank r2(v) = 2·cum_below +
  *    cnt + 1 stays integer, per-group rank sums are exact int64
  *    Σ c_jv·r2(v), and ties correct via Σ(t³−t) on the same table.
  *
  * Scale shape: every query is one map-side-combinable groupBy to a
  * bounded cell table (|groups|, |types|·12, |groups|·|domain|) and
  * window passes over those cells only — the raw fact table is
  * touched exactly once, and no global per-row sort exists (the
  * Kruskal rank table is value-domain-bounded, not row-bounded). */
object Breadth82 {

  private def lastOf(run: DataFrame, ord: Column*): DataFrame = {
    val w = Window.orderBy(ord: _*)
    run.withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy()))
      .filter(col("__rn") === col("__cnt"))
  }

  /** One-way ANOVA F + η² of `xCol` across `grpCol`. */
  private[graft] def anovaF(df: DataFrame, grpCol: String,
                            xCol: String): DataFrame = {
    val g = df.groupBy(col(grpCol))
      .agg(count(lit(1)).as("__n"),
        sum(col(xCol).cast("long")).as("__s"),
        sum(col(xCol).cast("long") * col(xCol).cast("long")).as("__q"))
    val wAll = Window.partitionBy()
    val ordRun = Window.orderBy(col(grpCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = g
      .withColumn("__totn", sum(col("__n")).over(wAll))
      .withColumn("__tots", sum(col("__s")).over(wAll))
      .withColumn("__totq", sum(col("__q")).over(wAll))
      .withColumn("__k", count(lit(1)).over(wAll))
      .withColumn("__term",
        (col("__s").cast("double") * col("__s").cast("double")) /
          col("__n").cast("double"))
      .withColumn("__sb", sum(col("__term")).over(ordRun))
    val last = lastOf(run, col(grpCol).asc)
    val grand = (col("__tots").cast("double") * col("__tots").cast("double")) /
      col("__totn").cast("double")
    val ssb = col("__sb") - grand
    val ssw = col("__totq").cast("double") - col("__sb")
    val sst = col("__totq").cast("double") - grand
    last.select(col("__totn").as("n_obs"), col("__k").as("k_groups"),
      when(col("__k") > 1 && col("__totn") > col("__k") && ssw > 0,
        round((ssb / (col("__k") - 1).cast("double")) /
          (ssw / (col("__totn") - col("__k")).cast("double")), 6))
        .as("f_stat"),
      when(sst > 0, round(ssb / sst, 6)).as("eta_sq"))
  }

  /** Cramér's V of `typeCol` × calendar month of `tsCol`. */
  private[graft] def cramersV(df: DataFrame, typeCol: String,
                              tsCol: String): DataFrame = {
    val cells = df
      .withColumn("__m", month(col(tsCol).cast("date")).cast("long"))
      .groupBy(col(typeCol), col("__m"))
      .agg(count(lit(1)).as("__o"))
    val wRow = Window.partitionBy(col(typeCol))
    val wCol = Window.partitionBy(col("__m"))
    val wAll = Window.partitionBy()
    val ordW = Window.orderBy(col(typeCol).asc, col("__m").asc)
    val dims = cells.agg(
      countDistinct(col(typeCol)).as("__nr"),
      countDistinct(col("__m")).as("__nc"))
    val run = cells
      .withColumn("__n", sum(col("__o")).over(wAll))
      .withColumn("__e",
        sum(col("__o")).over(wRow).cast("double") *
          sum(col("__o")).over(wCol).cast("double") /
          col("__n").cast("double"))
      .withColumn("__term",
        (col("__o").cast("double") - col("__e")) *
          (col("__o").cast("double") - col("__e")) / col("__e"))
      .withColumn("__chi", sum(col("__term")).over(
        ordW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val last = lastOf(run, col(typeCol).asc, col("__m").asc)
      .crossJoin(broadcast(dims))
    val minDim = least(col("__nr") - 1, col("__nc") - 1)
    last.select(col("__n").as("n_obs"),
      ((col("__nr") - 1) * (col("__nc") - 1)).as("dof"),
      round(col("__chi"), 6).as("chi2"),
      when(minDim > 0,
        round(sqrt(col("__chi") /
          (col("__n").cast("double") * minDim.cast("double"))), 6))
        .as("cramers_v"))
  }

  /** Tie-corrected Kruskal-Wallis H of `xCol` across `grpCol`. */
  private[graft] def kruskal(df: DataFrame, grpCol: String,
                             xCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    // |domain|-row value-count table: doubled average rank per value
    // plus the (t³−t) tie term, both exact integers.
    val ordV = Window.orderBy(col("__v").asc)
    val vc = df.select(x.as("__v")).groupBy(col("__v"))
      .agg(count(lit(1)).as("__t"))
      .withColumn("__cumb", coalesce(sum(col("__t")).over(
        ordV.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__r2", lit(2L) * col("__cumb") + col("__t") + 1L)
      .withColumn("__tie", col("__t") * col("__t") * col("__t") - col("__t"))
    // per-(group, value) counts × doubled rank → exact per-group sums
    val gv = df.select(col(grpCol), x.as("__v"))
      .groupBy(col(grpCol), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .join(broadcast(vc.select(col("__v"), col("__r2"))), Seq("__v"))
    val g = gv.groupBy(col(grpCol))
      .agg(sum(col("__c")).as("__n"),
        sum(col("__c") * col("__r2")).as("__R2"))
    val ties = vc.agg(sum(col("__tie")).as("__tsum"),
      sum(col("__t")).as("__nobs"))
    val ordRun = Window.orderBy(col(grpCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = g
      .withColumn("__k", count(lit(1)).over(Window.partitionBy()))
      .withColumn("__term",
        (col("__R2").cast("double") * col("__R2").cast("double")) /
          (lit(4.0) * col("__n").cast("double")))
      .withColumn("__sr", sum(col("__term")).over(ordRun))
    val last = lastOf(run, col(grpCol).asc).crossJoin(broadcast(ties))
    val nD = col("__nobs").cast("double")
    val h = lit(12.0) / (nD * (nD + 1.0)) * col("__sr") -
      lit(3.0) * (nD + 1.0)
    val corr = lit(1.0) - col("__tsum").cast("double") / (nD * nD * nD - nD)
    last.select(col("__nobs").as("n_obs"), col("__k").as("k_groups"),
      round(h, 6).as("h_stat"),
      when(corr > 0, round(h / corr, 6)).as("h_corrected"))
  }

  val defs: Map[String, Q] = Map(
    "q_anova_f" -> ((s, dir) =>
      anovaF(Tables.documents(s, dir), "source", "n_chars")),
    "q_cramers_v" -> ((s, dir) =>
      cramersV(Tables.events(s, dir), "event_type", "ts")),
    "q_kruskal" -> ((s, dir) =>
      kruskal(Tables.documents(s, dir), "source", "n_chars")))

  val oracle: Map[String, String] = Map(
    "q_anova_f" ->
      """WITH g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(n_chars) AS BIGINT) AS s,
        |    CAST(sum(n_chars * n_chars) AS BIGINT) AS q
        |  FROM documents GROUP BY 1),
        |run AS (
        |  SELECT
        |    CAST(sum(n) OVER () AS BIGINT) AS nn,
        |    CAST(sum(s) OVER () AS BIGINT) AS tt,
        |    CAST(sum(q) OVER () AS BIGINT) AS qq,
        |    CAST(count(*) OVER () AS BIGINT) AS k,
        |    sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |      OVER (ORDER BY source
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sb,
        |    row_number() OVER (ORDER BY source) AS rn,
        |    count(*) OVER () AS cnt
        |  FROM g)
        |SELECT nn AS n_obs, k AS k_groups,
        |  CASE WHEN k > 1 AND nn > k
        |      AND CAST(qq AS DOUBLE) - sb > 0 THEN
        |    round(((sb - CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE)
        |        / CAST(nn AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
        |      / ((CAST(qq AS DOUBLE) - sb) / CAST(nn - k AS DOUBLE)), 6)
        |  END AS f_stat,
        |  CASE WHEN CAST(qq AS DOUBLE) - CAST(tt AS DOUBLE)
        |      * CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE) > 0 THEN
        |    round((sb - CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE)
        |        / CAST(nn AS DOUBLE))
        |      / (CAST(qq AS DOUBLE) - CAST(tt AS DOUBLE)
        |        * CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE)), 6)
        |  END AS eta_sq
        |FROM run WHERE rn = cnt""".stripMargin,

    "q_cramers_v" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(month(CAST(ts AS DATE)) AS BIGINT) AS m,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |dims AS (
        |  SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS nr,
        |    CAST(count(DISTINCT m) AS BIGINT) AS nc
        |  FROM cells),
        |terms AS (
        |  SELECT event_type, m, o,
        |    CAST(sum(o) OVER () AS BIGINT) AS n,
        |    (CAST(o AS DOUBLE)
        |      - CAST(sum(o) OVER (PARTITION BY event_type) AS DOUBLE)
        |        * CAST(sum(o) OVER (PARTITION BY m) AS DOUBLE)
        |        / CAST(sum(o) OVER () AS DOUBLE))
        |    * (CAST(o AS DOUBLE)
        |      - CAST(sum(o) OVER (PARTITION BY event_type) AS DOUBLE)
        |        * CAST(sum(o) OVER (PARTITION BY m) AS DOUBLE)
        |        / CAST(sum(o) OVER () AS DOUBLE))
        |    / (CAST(sum(o) OVER (PARTITION BY event_type) AS DOUBLE)
        |        * CAST(sum(o) OVER (PARTITION BY m) AS DOUBLE)
        |        / CAST(sum(o) OVER () AS DOUBLE)) AS term
        |  FROM cells),
        |run AS (
        |  SELECT n,
        |    sum(term) OVER (ORDER BY event_type, m
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chi,
        |    row_number() OVER (ORDER BY event_type, m) AS rn,
        |    count(*) OVER () AS cnt
        |  FROM terms)
        |SELECT n AS n_obs, (nr - 1) * (nc - 1) AS dof,
        |  round(chi, 6) AS chi2,
        |  CASE WHEN least(nr - 1, nc - 1) > 0 THEN
        |    round(sqrt(chi / (CAST(n AS DOUBLE)
        |      * CAST(least(nr - 1, nc - 1) AS DOUBLE))), 6)
        |  END AS cramers_v
        |FROM run, dims WHERE rn = cnt""".stripMargin,

    "q_kruskal" ->
      """WITH vc AS (
        |  SELECT v, t,
        |    COALESCE(CAST(sum(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS cumb
        |  FROM (SELECT CAST(n_chars AS BIGINT) AS v,
        |          CAST(count(*) AS BIGINT) AS t
        |        FROM documents GROUP BY 1)),
        |rk AS (
        |  SELECT v, t, 2 * cumb + t + 1 AS r2,
        |    t * t * t - t AS tie
        |  FROM vc),
        |gv AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |g AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(c * rk.r2) AS BIGINT) AS R2
        |  FROM gv JOIN rk ON gv.v = rk.v GROUP BY 1),
        |ties AS (
        |  SELECT CAST(sum(tie) AS BIGINT) AS tsum,
        |    CAST(sum(t) AS BIGINT) AS N FROM rk),
        |run AS (
        |  SELECT CAST(count(*) OVER () AS BIGINT) AS k,
        |    sum(CAST(R2 AS DOUBLE) * CAST(R2 AS DOUBLE)
        |        / (4.0 * CAST(n AS DOUBLE)))
        |      OVER (ORDER BY source
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sr,
        |    row_number() OVER (ORDER BY source) AS rn,
        |    count(*) OVER () AS cnt
        |  FROM g)
        |SELECT N AS n_obs, k AS k_groups,
        |  round(12.0 / (CAST(N AS DOUBLE) * (CAST(N AS DOUBLE) + 1.0))
        |    * sr - 3.0 * (CAST(N AS DOUBLE) + 1.0), 6) AS h_stat,
        |  CASE WHEN 1.0 - CAST(tsum AS DOUBLE)
        |      / (CAST(N AS DOUBLE) * CAST(N AS DOUBLE) * CAST(N AS DOUBLE)
        |        - CAST(N AS DOUBLE)) > 0 THEN
        |    round((12.0 / (CAST(N AS DOUBLE) * (CAST(N AS DOUBLE) + 1.0))
        |      * sr - 3.0 * (CAST(N AS DOUBLE) + 1.0))
        |      / (1.0 - CAST(tsum AS DOUBLE)
        |        / (CAST(N AS DOUBLE) * CAST(N AS DOUBLE)
        |          * CAST(N AS DOUBLE) - CAST(N AS DOUBLE))), 6)
        |  END AS h_corrected
        |FROM run, ties WHERE rn = cnt""".stripMargin)
}
