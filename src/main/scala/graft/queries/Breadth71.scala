package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventy-second wave — midpoint momentum, nonparametric testing,
  * decomposable inequality.
  *
  *  - **q_awesome_osc**: Bill Williams' Awesome Oscillator, downsized
  *    to (3, 13) so full windows exist at every SF (bars per key run
  *    22–30): SMA₃(mid) − SMA₁₃(mid) over the bar midpoint. The
  *    midpoint is kept as the INTEGER high+low (twice the mid), each
  *    SMA is one integer window sum, and the emit is two divisions and
  *    a subtraction in pinned operand order — no float accumulates.
  *  - **q_mann_whitney**: the Mann-Whitney U rank-sum test of each
  *    source's doc-length distribution against the rest of the corpus.
  *    Tie-averaged ranks are carried DOUBLED (2·rank + cnt − 1 — an
  *    exact integer), so U and the rank sums stay integers until the
  *    one z-score division; ranks come from prefix sums over the
  *    |distinct lengths| value table, never a global per-doc sort.
  *  - **q_theil_index**: the Theil T inequality index over
  *    per-customer revenue, T = (1/S)·Σ xᵢ·ln(xᵢ·N/S) — each ln term
  *    quantized to integer micronats (the q_kl_source / q_bigram_lm
  *    1e-6 discipline) so the sum is order-free; Gini's decomposable
  *    sibling (q_gini pairs with it).
  *
  * Scale shape: awesome_osc rides the memoized bar grid with two
  * bounded window frames; mann_whitney aggregates to the |distinct
  * n_chars| value table before any window; theil is one groupBy + a
  * broadcast scalar + one map-side-combinable integer sum. */
object Breadth71 {

  /** AO = SMA(fast) − SMA(slow) of the bar midpoint, integer sums. */
  private[graft] def awesomeOsc(df: DataFrame, keyCol: String, tsCol: String,
                                valCol: String, tieBreak: String,
                                fast: Int = 3, slow: Int = 13): DataFrame = {
    val days = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val wf = days.rowsBetween(-(fast - 1), Window.currentRow)
    val ws = days.rowsBetween(-(slow - 1), Window.currentRow)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__m2", col("high") + col("low"))
      .withColumn("__sf", sum(col("__m2")).over(wf))
      .withColumn("__ss", sum(col("__m2")).over(ws))
      .withColumn("__n", count(lit(1)).over(ws))
      .select(col(keyCol), col("day"),
        when(col("__n") === slow,
          (col("__sf").cast("double") / lit(fast * 2.0) -
            col("__ss").cast("double") / lit(slow * 2.0)) / lit(100.0))
          .as("ao"))
      .orderBy(col(keyCol).asc, col("day").asc)
  }

  /** Mann-Whitney U of each stratum's `vCol` vs the rest; doubled
    * tie-averaged ranks keep everything integer until the z division. */
  private[graft] def mannWhitney(df: DataFrame, stratCol: String,
                                 vCol: String): DataFrame = {
    val vc = df.groupBy(col(vCol).as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val ord = Window.orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // doubled tie-averaged rank of value v: 2·(prefix+1) + cnt − 1
    val r2 = vc
      .withColumn("__r2",
        lit(2L) * (coalesce(sum(col("__cnt")).over(ord), lit(0L)) + 1L) +
          col("__cnt") - lit(1L))
    val sc = df.groupBy(col(stratCol).as("source"), col(vCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val tot = df.agg(count(lit(1)).as("__nn"))
    val g = sc.join(r2.select(col("__v"), col("__r2")), Seq("__v"))
      .groupBy(col("source"))
      .agg(sum(col("__c")).as("n_docs"),
        sum(col("__c") * col("__r2")).as("__r1x2"))
      .crossJoin(broadcast(tot))
    val n1 = col("n_docs")
    val n2 = col("__nn") - n1
    val u2 = col("__r1x2") - n1 * (n1 + lit(1L))
    g.select(col("source"), col("n_docs"),
      (u2.cast("double") / lit(2.0)).as("u"),
      ((u2 - n1 * n2).cast("double") /
        (lit(2.0) * sqrt((n1 * n2 * (col("__nn") + lit(1L))).cast("double") /
          lit(12.0)))).as("z"))
      .orderBy(col("source").asc)
  }

  /** Theil T index over per-key summed cents (micronat-quantized). */
  private[graft] def theilIndex(df: DataFrame, keyCol: String,
                                amountCents: org.apache.spark.sql.Column)
      : DataFrame = {
    val per = df.groupBy(col(keyCol)).agg(sum(amountCents).as("__x"))
      .filter(col("__x") > 0)
    val tot = per.agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"))
    val lr = floor(
      log((col("__x") * col("__n")).cast("double") /
        col("__s").cast("double")) * lit(1.0e6) + lit(0.5)).cast("long")
    per.crossJoin(broadcast(tot))
      .withColumn("__lr", lr)
      .groupBy()
      .agg(max(col("__n")).as("n_keys"), max(col("__s")).as("total_cents"),
        sum(col("__x") * col("__lr")).as("__t"))
      .select(col("n_keys"), col("total_cents"),
        (col("__t").cast("double") / col("total_cents").cast("double") /
          lit(1.0e6)).as("theil"))
  }

  val defs: Map[String, Q] = Map(
    "q_awesome_osc" -> ((s, dir) =>
      awesomeOsc(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_mann_whitney" -> ((s, dir) =>
      mannWhitney(Tables.documents(s, dir), "source", "n_chars")),
    "q_theil_index" -> ((s, dir) =>
      theilIndex(Tables.orders(s, dir), "o_custkey",
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))))

  val oracle: Map[String, String] = Map(
    "q_awesome_osc" ->
      """WITH t AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |bars AS (
        |  SELECT user_id, day, max(c) + min(c) AS m2
        |  FROM t GROUP BY user_id, day)
        |SELECT user_id, day,
        |  CASE WHEN count(*) OVER ws = 13 THEN
        |    (CAST(sum(m2) OVER wf AS DOUBLE) / 6.0
        |      - CAST(sum(m2) OVER ws AS DOUBLE) / 26.0) / 100.0
        |  END AS ao
        |FROM bars
        |WINDOW
        |  wf AS (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        |  ws AS (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN 12 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, day""".stripMargin,

    "q_mann_whitney" ->
      """WITH vc AS (
        |  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1),
        |r2 AS (
        |  SELECT v,
        |    2 * (coalesce(sum(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1)
        |      + cnt - 1 AS r2
        |  FROM vc),
        |sc AS (
        |  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents),
        |g AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
        |    CAST(sum(c * r2.r2) AS BIGINT) AS r1x2
        |  FROM sc JOIN r2 USING (v) GROUP BY 1)
        |SELECT source, n_docs,
        |  CAST(r1x2 - n_docs * (n_docs + 1) AS DOUBLE) / 2.0 AS u,
        |  CAST(r1x2 - n_docs * (n_docs + 1)
        |      - n_docs * (nn - n_docs) AS DOUBLE)
        |    / (2.0 * sqrt(CAST(n_docs * (nn - n_docs) * (nn + 1)
        |      AS DOUBLE) / 12.0)) AS z
        |FROM g CROSS JOIN tot ORDER BY source""".stripMargin,

    "q_theil_index" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS x
        |  FROM orders GROUP BY 1 HAVING x > 0),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
        |  FROM per),
        |term AS (
        |  SELECT x,
        |    CAST(floor(ln(CAST(x * n AS DOUBLE) / CAST(s AS DOUBLE))
        |      * 1.0e6 + 0.5) AS BIGINT) AS lr
        |  FROM per CROSS JOIN tot)
        |SELECT max(tot.n) AS n_keys, max(tot.s) AS total_cents,
        |  CAST(CAST(sum(x * lr) AS BIGINT) AS DOUBLE)
        |    / CAST(max(tot.s) AS DOUBLE) / 1.0e6 AS theil
        |FROM term CROSS JOIN tot""".stripMargin)
}
