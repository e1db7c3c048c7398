package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Twenty-ninth wave — range-based volatility estimators and market
  * concentration, the risk-desk aggregates computed FROM the OHLC
  * history the reference only renders (`frontend/src/App.js:464-571`):
  *
  *  - Parkinson volatility (the high/low range estimator);
  *  - Garman–Klass volatility (range + open/close body);
  *  - Kyle-style price-impact slope (|Δclose| regressed on volume —
  *    the OLS sibling of q_amihud's aggregate ratio);
  *  - Herfindahl–Hirschman volume concentration across keys (the
  *    market-structure one-rower, Gini's square-share sibling).
  *
  * Exact-parity discipline: the log-range terms are transcendental.
  * Integer quantization (floor(1e12·ln²)) was tried first and REJECTED
  * by the sf0.01 gate: Java's Math.log and DuckDB's ln() differ by one
  * ulp on some inputs, and at 1e12 quanta a 1-ulp difference flips a
  * floor with probability ~value·2e-4 per bar — measured live as one
  * flipped bar in 60k. So these two queries use the q_token_entropy
  * discipline instead: per-key SUMS of identical-expression double
  * terms (ulp-aligned except for those rare 1-ulp inputs), with the
  * estimator rounded to 6 dp — accumulated noise is ~1e-13 relative,
  * six orders under the rounding grain. The 4ln2 constant is written
  * as the same expression (4.0·ln(2.0)) in both engines, never a
  * decimal literal (the DECIMAL lesson). Kyle's λ and the HHI are pure
  * integer co-moments with one terminal division each — no
  * transcendentals, no rounding. Zero-price bars (L = 0, present in
  * the regenerated testdata) are excluded from the log estimators in
  * both engines.
  *
  * Scale shape: one groupBy to the bar table, one hash aggregate per
  * key (map-side partials); the HHI is an aggregate OVER the |keys|-
  * sized per-key totals (the q_gini altitude — never row-sized).
  * Int64 headroom: ln(H/L)² < 1 for any realistic bar, so the 1e-12
  * quantum keeps Σq < 10¹²·L — decades of bars sit 6 orders inside
  * int64; HHI's Σx² bounds at |keys|·(max per-key qty)² — re-base
  * volume units past ~10⁹ per key (the marketBeta note).
  */
object Breadth29 {

  /** OHLC bars with per-day volume and the per-bar log terms; zero-
    * price bars excluded (L > 0 ⇒ O,C,H > 0 too). */
  private def logBars(df: DataFrame, keyCol: String, tsCol: String,
                      valCol: String, tieBreak: String,
                      qtyJsonField: String): DataFrame = {
    val hl = log(col("high").cast("double") / col("low").cast("double"))
    val co = log(col("close").cast("double") / col("open").cast("double"))
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .join(Breadth27.dayVols(df, keyCol, tsCol, qtyJsonField),
        Seq(keyCol, "day"))
      .filter(col("low") > 0)
      .withColumn("__pt", hl * hl)
      .withColumn("__gt", lit(0.5) * hl * hl -
        (lit(2.0) * log(lit(2.0)) - lit(1.0)) * co * co)
  }

  /** Parkinson volatility per key: σ_P = √(Σln(H/L)² / (4ln2·n)),
    * rounded 6 dp (the transcendental-sum discipline — see object
    * doc). */
  private[graft] def parkinson(df: DataFrame, keyCol: String, tsCol: String,
                               valCol: String, tieBreak: String,
                               qtyJsonField: String): DataFrame =
    logBars(df, keyCol, tsCol, valCol, tieBreak, qtyJsonField)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"), sum(col("__pt")).as("__s"))
      .select(col(keyCol), col("n_days"),
        round(sqrt(col("__s") /
          (lit(4.0) * log(lit(2.0)) * col("n_days"))), 6).as("sigma_p"))

  /** Garman–Klass volatility per key: σ_GK = √(Σ[½ln(H/L)² −
    * (2ln2−1)·ln(C/O)²] / n), rounded 6 dp (negative sums —
    * pathological bodies — are unscored). */
  private[graft] def garmanKlass(df: DataFrame, keyCol: String, tsCol: String,
                                 valCol: String, tieBreak: String,
                                 qtyJsonField: String): DataFrame =
    logBars(df, keyCol, tsCol, valCol, tieBreak, qtyJsonField)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"), sum(col("__gt")).as("__s"))
      .select(col(keyCol), col("n_days"),
        when(col("__s") >= 0,
          round(sqrt(col("__s") / col("n_days")), 6)).as("sigma_gk"))

  /** Kyle-style impact slope per key: OLS of |Δclose| (cents) on day
    * volume — λ = (n·Σvy − Σv·Σy)/(n·Σv² − (Σv)²), integer co-moments,
    * one division. Days pair consecutively over PRESENT days (the
    * q_sharpe lag convention); zero-variance volume is unscored. */
  private[graft] def kyleLambda(df: DataFrame, keyCol: String, tsCol: String,
                                valCol: String, tieBreak: String,
                                qtyJsonField: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("day").asc)
    val g = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .join(Breadth27.dayVols(df, keyCol, tsCol, qtyJsonField),
        Seq(keyCol, "day"))
      .withColumn("__y", abs(col("close") - lag(col("close"), 1).over(w)))
      .filter(col("__y").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum(col("__v")).as("__sv"), sum(col("__y")).as("__sy"),
        sum(col("__v") * col("__v")).as("__svv"),
        sum(col("__v") * col("__y")).as("__svy"))
    val num = col("n_days") * col("__svy") - col("__sv") * col("__sy")
    val den = col("n_days") * col("__svv") - col("__sv") * col("__sv")
    g.select(col(keyCol), col("n_days"),
      when(den > 0, num.cast("double") / den.cast("double"))
        .as("kyle_lambda"))
  }

  /** Herfindahl–Hirschman volume concentration: one row over per-key
    * total quantities — HHI = Σx²/(Σx)², normalized
    * HHI* = (n·Σx² − S²)/((n−1)·S²) — integer numerators and
    * denominators, one division each. */
  private[graft] def herfindahl(df: DataFrame, keyCol: String, tsCol: String,
                                qtyJsonField: String): DataFrame = {
    val per = Breadth27.dayVols(df, keyCol, tsCol, qtyJsonField)
      .groupBy(col(keyCol)).agg(sum(col("__v")).as("__x"))
      .filter(col("__x") > 0)
    per.agg(count(lit(1)).as("n_keys"), sum(col("__x")).as("sum_qty"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .select(col("n_keys"), col("sum_qty"),
        (col("__sxx").cast("double") /
          (col("sum_qty") * col("sum_qty")).cast("double")).as("hhi"),
        when(col("n_keys") > 1,
          (col("n_keys") * col("__sxx") -
            col("sum_qty") * col("sum_qty")).cast("double") /
            ((col("n_keys") - lit(1L)) *
              col("sum_qty") * col("sum_qty")).cast("double"))
          .as("hhi_norm"))
  }

  val defs: Map[String, Q] = Map(
    // Parkinson range volatility from quantized log-range terms.
    "q_parkinson" -> ((s, dir) =>
      parkinson(Tables.events(s, dir), "user_id", "ts", "value", "event_id",
        "k")
        .orderBy(col("user_id").asc)),

    // Garman-Klass range+body volatility.
    "q_garman_klass" -> ((s, dir) =>
      garmanKlass(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id", "k")
        .orderBy(col("user_id").asc)),

    // Kyle-style price-impact OLS slope.
    "q_kyle_lambda" -> ((s, dir) =>
      kyleLambda(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id", "k")
        .orderBy(col("user_id").asc)),

    // Market-wide volume concentration (one row).
    "q_herfindahl" -> ((s, dir) =>
      herfindahl(Tables.events(s, dir), "user_id", "ts", "k")))

  /** Shared OHLC-with-open bar + volume CTE prefix (L > 0 screened). */
  private val ohlcVolSql =
    """t AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id, props
      |  FROM events),
      |bars AS (
      |  SELECT user_id, day, max(op) AS open, max(cl) AS close,
      |    max(c) AS high, min(c) AS low
      |  FROM (
      |    SELECT user_id, day, c,
      |      first_value(c) OVER (PARTITION BY user_id, day ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS op,
      |      last_value(c) OVER (PARTITION BY user_id, day ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cl
      |    FROM t)
      |  GROUP BY user_id, day),
      |vols AS (
      |  SELECT user_id, day,
      |    CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS v
      |  FROM t GROUP BY user_id, day),
      |vb AS (
      |  SELECT b.user_id, b.day, b.open, b.close, b.high, b.low, v.v
      |  FROM bars b JOIN vols v ON b.user_id = v.user_id AND b.day = v.day
      |  WHERE v.v IS NOT NULL AND b.low > 0)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_parkinson" ->
      s"""WITH $ohlcVolSql,
         |q AS (
         |  SELECT user_id,
         |    ln(CAST(high AS DOUBLE) / CAST(low AS DOUBLE))
         |      * ln(CAST(high AS DOUBLE) / CAST(low AS DOUBLE)) AS pt
         |  FROM vb)
         |SELECT user_id, count(*) AS n_days,
         |  round(sqrt(sum(pt) / (4.0 * ln(2.0) * count(*))), 6) AS sigma_p
         |FROM q GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_garman_klass" ->
      s"""WITH $ohlcVolSql,
         |q AS (
         |  SELECT user_id,
         |    0.5
         |        * ln(CAST(high AS DOUBLE) / CAST(low AS DOUBLE))
         |        * ln(CAST(high AS DOUBLE) / CAST(low AS DOUBLE))
         |      - (2.0 * ln(2.0) - 1.0)
         |        * ln(CAST(close AS DOUBLE) / CAST(open AS DOUBLE))
         |        * ln(CAST(close AS DOUBLE) / CAST(open AS DOUBLE)) AS gt
         |  FROM vb)
         |SELECT user_id, count(*) AS n_days,
         |  CASE WHEN sum(gt) >= 0
         |    THEN round(sqrt(sum(gt) / count(*)), 6) END AS sigma_gk
         |FROM q GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_kyle_lambda" ->
      """WITH t AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id, props
        |  FROM events),
        |bars AS (
        |  SELECT user_id, day, max(cl) AS close
        |  FROM (
        |    SELECT user_id, day,
        |      last_value(c) OVER (PARTITION BY user_id, day ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cl
        |    FROM t)
        |  GROUP BY user_id, day),
        |vols AS (
        |  SELECT user_id, day,
        |    CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS v
        |  FROM t GROUP BY user_id, day),
        |j AS (
        |  SELECT b.user_id, b.day, b.close, v.v
        |  FROM bars b JOIN vols v ON b.user_id = v.user_id AND b.day = v.day
        |  WHERE v.v IS NOT NULL),
        |d AS (
        |  SELECT user_id, v,
        |    abs(close - lag(close) OVER (PARTITION BY user_id ORDER BY day)) AS y
        |  FROM j),
        |f AS (SELECT user_id, v, y FROM d WHERE y IS NOT NULL),
        |g AS (
        |  SELECT user_id, count(*) AS n,
        |    CAST(sum(v) AS BIGINT) AS sv, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(v * v) AS BIGINT) AS svv,
        |    CAST(sum(v * y) AS BIGINT) AS svy
        |  FROM f GROUP BY user_id)
        |SELECT user_id, n AS n_days,
        |  CASE WHEN n * svv - sv * sv > 0
        |    THEN CAST(n * svy - sv * sy AS DOUBLE)
        |      / CAST(n * svv - sv * sv AS DOUBLE) END AS kyle_lambda
        |FROM g ORDER BY user_id""".stripMargin,

    "q_herfindahl" ->
      """WITH t AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, props FROM events),
        |vols AS (
        |  SELECT user_id, day,
        |    CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS v
        |  FROM t GROUP BY user_id, day),
        |per AS (
        |  SELECT user_id, CAST(sum(v) AS BIGINT) AS x
        |  FROM vols WHERE v IS NOT NULL GROUP BY user_id
        |  HAVING CAST(sum(v) AS BIGINT) > 0),
        |g AS (
        |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM per)
        |SELECT n AS n_keys, s AS sum_qty,
        |  CAST(sxx AS DOUBLE) / CAST(s * s AS DOUBLE) AS hhi,
        |  CASE WHEN n > 1
        |    THEN CAST(n * sxx - s * s AS DOUBLE)
        |      / CAST((n - 1) * s * s AS DOUBLE) END AS hhi_norm
        |FROM g""".stripMargin)
}
