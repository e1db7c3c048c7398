package graft.queries

import graft.Tables
import graft.text.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Seventy-first wave — factor-model residual return, calendar
  * anomalies, corpus drift.
  *
  *  - **q_jensen_alpha**: Jensen's α and the Treynor ratio per key
  *    against the q_beta market factor (same consecutive-calendar-day
  *    move grid, same Σ-of-moves market). Every moment accumulates in
  *    decimal(38,0) / HUGEINT; the emits cast the four exact
  *    aggregates to double FIRST and run α = (Σx − β·Σm)/n and
  *    Treynor = (Σx/n)/β in pinned IEEE order (a single-division
  *    integer form like Σx·den − num·Σm exceeds 2^53, where Spark
  *    Decimal→double and DuckDB HUGEINT→double casts differ in the
  *    last ulp — measured at sf0.01). β ≤ 0 leaves Treynor unscored
  *    (the standard treatment); zero market variance leaves both
  *    unscored.
  *  - **q_weekday_effect**: the day-of-week anomaly — per ISO weekday,
  *    the mean day-bar cent move and the up-day share across all keys.
  *    Two integer sums + one count per group; exercises calendar
  *    function parity (Spark `weekday()+1` == DuckDB `isodow`).
  *  - **q_kl_source**: per-source unigram-distribution drift — the KL
  *    divergence KL(P_source ‖ P_corpus) in bits. Each token's
  *    log2-ratio is quantized to integer microbits (the q_bigram_lm
  *    1e-6 discipline — measured clean across engines at sf0.1), so
  *    the per-source sum is an order-free integer sum; one terminal
  *    division pair scales back to bits.
  *
  * Scale shape: jensen_alpha is one |key·days| bar shuffle + a
  * |days|-bounded market table joined back broadcast-size;
  * weekday_effect is a 7-row aggregate over the memoized move grid;
  * kl_source is |vocab|-bounded per source after one token explode —
  * the corpus marginal derives from the same (source, tok) aggregate,
  * never a second scan. */
object Breadth70 {

  private val dec = DecimalType(38, 0)
  private def wide(c: Column): Column = c.cast(dec)

  /** Jensen α + Treynor per key on the q_beta market grid. */
  private[graft] def jensenAlpha(df: DataFrame, keyCol: String, tsCol: String,
                                 valCol: String, tieBreak: String): DataFrame = {
    val bars = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .select(col(keyCol), col("day"), col("close"))
    val cur = bars.select(col(keyCol), col("day"), col("close").as("__c1"))
    val prev = bars.select(col(keyCol), date_add(col("day"), 1).as("day"),
      col("close").as("__c0"))
    val diffs = cur.join(prev, Seq(keyCol, "day"))
      .select(col(keyCol), col("day"), (col("__c1") - col("__c0")).as("__x"))
    val mkt = diffs.groupBy(col("day")).agg(sum(col("__x")).as("__m"))
    val g = diffs.join(mkt, Seq("day"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum(wide(col("__x"))).as("__sx"),
        sum(wide(col("__m"))).as("__sm"),
        sum(wide(col("__x")) * wide(col("__m"))).as("__sxm"),
        sum(wide(col("__m")) * wide(col("__m"))).as("__smm"))
    val nW = wide(col("n_days"))
    val num = nW * col("__sxm") - col("__sx") * col("__sm")
    val den = nW * col("__smm") - col("__sm") * col("__sm")
    // The β numerator/denominator stay exact decimals; the emits then
    // run in PURE double arithmetic on identically-cast operands (a
    // >2^53 integer combination like Σx·den casts differently between
    // Spark Decimal and DuckDB HUGEINT in the last ulp — measured at
    // sf0.01 — so the one-division integer form is NOT parity-safe
    // here; identical IEEE op order is).
    val nD = col("n_days").cast("double")
    val sxD = col("__sx").cast("double")
    val smD = col("__sm").cast("double")
    val numD = num.cast("double")
    val denD = den.cast("double")
    g.select(col(keyCol), col("n_days"),
      when(den > 0,
        (sxD - numD / denD * smD) / nD).as("alpha_cents"),
      when(den > 0 && num > 0,
        (sxD / nD) / (numD / denD)).as("treynor_cents"))
      .orderBy(col(keyCol).asc)
  }

  /** Mean move + up-share per ISO weekday over all keys' day moves. */
  private[graft] def weekdayEffect(df: DataFrame, keyCol: String,
                                   tsCol: String, valCol: String,
                                   tieBreak: String): DataFrame =
    Breadth67.dayMoves(df, keyCol, tsCol, valCol, tieBreak)
      .groupBy((weekday(col("day")) + lit(1)).as("iso_dow"))
      .agg(count(lit(1)).as("n_moves"),
        sum(col("__x")).as("sum_move_cents"),
        sum(when(col("__x") > 0, lit(1L)).otherwise(lit(0L))).as("__up"))
      .select(col("iso_dow"), col("n_moves"), col("sum_move_cents"),
        (col("sum_move_cents").cast("double") /
          col("n_moves").cast("double")).as("mean_move_cents"),
        (col("__up").cast("double") /
          col("n_moves").cast("double")).as("up_share"))
      .orderBy(col("iso_dow").asc)

  /** KL(P_source ‖ P_corpus) in bits over whitespace unigrams,
    * microbit-quantized per term. */
  private[graft] def klSource(docs: DataFrame, srcCol: String,
                              textCol: String): DataFrame = {
    val sc = docs
      .select(col(srcCol), explode(Text.tokens(col(textCol))).as("tok"))
      .groupBy(col(srcCol), col("tok")).agg(count(lit(1)).as("__c"))
    val cw = sc.groupBy(col("tok")).agg(sum(col("__c")).as("__cc"))
    val ns = sc.groupBy(col(srcCol)).agg(sum(col("__c")).as("__ns"))
    val nc = cw.agg(sum(col("__cc")).as("__nc"))
    val lr = floor(
      log2((col("__c") * col("__nc")).cast("double") /
        (col("__cc") * col("__ns")).cast("double")) * lit(1.0e6) + lit(0.5))
      .cast("long")
    sc.join(cw, Seq("tok"))
      .join(ns, Seq(srcCol))
      .crossJoin(broadcast(nc))
      .withColumn("__lr", lr)
      .groupBy(col(srcCol).as("source"))
      .agg(max(col("__ns")).as("n_tokens"),
        sum(col("__c") * col("__lr")).as("__klm"))
      .select(col("source"), col("n_tokens"),
        (col("__klm").cast("double") / col("n_tokens").cast("double") /
          lit(1.0e6)).as("kl_bits"))
      .orderBy(col("source").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_jensen_alpha" -> ((s, dir) =>
      jensenAlpha(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_weekday_effect" -> ((s, dir) =>
      weekdayEffect(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_kl_source" -> ((s, dir) =>
      klSource(Tables.documents(s, dir), "source", "text")))

  val oracle: Map[String, String] = Map(
    "q_jensen_alpha" ->
      s"""WITH ${Breadth67.movesSql},
         |d AS (
         |  SELECT a.user_id, a.day, a.close - b.close AS x
         |  FROM bars a JOIN bars b
         |    ON a.user_id = b.user_id AND a.day = b.day + 1),
         |m AS (SELECT day, CAST(sum(x) AS BIGINT) AS mv FROM d GROUP BY day),
         |g AS (
         |  SELECT d.user_id, CAST(count(*) AS HUGEINT) AS n,
         |    CAST(sum(CAST(d.x AS HUGEINT)) AS HUGEINT) AS sx,
         |    CAST(sum(CAST(m.mv AS HUGEINT)) AS HUGEINT) AS sm,
         |    CAST(sum(CAST(d.x AS HUGEINT) * m.mv) AS HUGEINT) AS sxm,
         |    CAST(sum(CAST(m.mv AS HUGEINT) * m.mv) AS HUGEINT) AS smm
         |  FROM d JOIN m USING (day) GROUP BY d.user_id),
         |k AS (
         |  SELECT user_id, n, sx, sm,
         |    n * sxm - sx * sm AS num, n * smm - sm * sm AS den
         |  FROM g)
         |SELECT user_id, CAST(n AS BIGINT) AS n_days,
         |  CASE WHEN den > 0
         |    THEN (CAST(sx AS DOUBLE) - CAST(num AS DOUBLE)
         |        / CAST(den AS DOUBLE) * CAST(sm AS DOUBLE))
         |      / CAST(n AS DOUBLE) END AS alpha_cents,
         |  CASE WHEN den > 0 AND num > 0
         |    THEN (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
         |      / (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
         |    END AS treynor_cents
         |FROM k ORDER BY user_id""".stripMargin,

    "q_weekday_effect" ->
      s"""WITH ${Breadth67.movesSql}
         |SELECT CAST(isodow(day) AS INTEGER) AS iso_dow,
         |  CAST(count(*) AS BIGINT) AS n_moves,
         |  CAST(sum(x) AS BIGINT) AS sum_move_cents,
         |  CAST(CAST(sum(x) AS BIGINT) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS mean_move_cents,
         |  CAST(CAST(sum(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS up_share
         |FROM mv GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_kl_source" ->
      """WITH tk AS (
        |  SELECT source, unnest(regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
        |  FROM documents),
        |sc AS (
        |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM tk GROUP BY 1, 2),
        |cw AS (SELECT tok, CAST(sum(c) AS BIGINT) AS cc FROM sc GROUP BY 1),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS nst FROM sc GROUP BY 1),
        |nc AS (SELECT CAST(sum(cc) AS BIGINT) AS nct FROM cw),
        |term AS (
        |  SELECT sc.source, ns.nst, sc.c,
        |    CAST(floor(log2(CAST(sc.c * nc.nct AS DOUBLE)
        |      / CAST(cw.cc * ns.nst AS DOUBLE)) * 1.0e6 + 0.5) AS BIGINT)
        |      AS lr
        |  FROM sc JOIN cw USING (tok) JOIN ns USING (source) CROSS JOIN nc)
        |SELECT source, max(nst) AS n_tokens,
        |  CAST(CAST(sum(c * lr) AS BIGINT) AS DOUBLE)
        |    / CAST(max(nst) AS DOUBLE) / 1.0e6 AS kl_bits
        |FROM term GROUP BY source ORDER BY source""".stripMargin)
}
