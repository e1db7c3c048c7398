package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-seventh wave — the volume-weighted / band / ratio moving-
  * average family still missing from the indicator tier.
  *
  *  - **q_vwma**: trailing-10-bar volume-weighted moving average per
  *    key — Σ(close·vol)/Σvol over the ROWS frame, both sums int64
  *    (bars join the memoized day-volume grid), ONE division, null
  *    when the window's volume is zero.
  *  - **q_envelope**: SMA-20 ±2.5% envelope — the band edges emitted
  *    as single divisions of exact integer products (Σc·1025 / n·1000,
  *    so the non-representable 1.025 literal never exists), breakout
  *    flags decided by int64 cross-multiplication.
  *  - **q_disparity**: the disparity index 100·close/SMA-13 — one
  *    division of exact int64 products.
  *
  * Scale shape: all three are per-key ROWS-frame windows over the
  * memoized |key·days| bar grid — no tick rescans, no shuffles beyond
  * the grid's own. */
object Breadth106 {

  private val VwmaN = 10
  private val EnvN = 20
  private val EnvPermille = 25L // ±2.5%
  private val DispN = 13

  /** Trailing volume-weighted moving average per key-day. */
  private[graft] def vwma(df: DataFrame, keyCol: String, tsCol: String,
                          valCol: String, tieBreak: String,
                          qtyJsonField: String,
                          n: Int = VwmaN): DataFrame = {
    val frame = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(-(n - 1), Window.currentRow)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .join(Breadth27.dayVols(df, keyCol, tsCol, qtyJsonField),
        Seq(keyCol, "day"))
      .withColumn("__spv", sum(col("close") * col("__v")).over(frame))
      .withColumn("__sv", sum(col("__v")).over(frame))
      .select(col(keyCol), col("day"),
        (col("close").cast("double") / lit(100.0)).as("close"),
        when(col("__sv") > 0,
          col("__spv").cast("double") / col("__sv").cast("double") /
            lit(100.0)).as("vwma"))
      .orderBy(col(keyCol).asc, col("day").asc)
  }

  /** SMA-20 ±2.5% envelope with integer-exact breakout flags. */
  private[graft] def envelope(df: DataFrame, keyCol: String, tsCol: String,
                              valCol: String, tieBreak: String,
                              n: Int = EnvN,
                              permille: Long = EnvPermille): DataFrame = {
    val frame = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(-(n - 1), Window.currentRow)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__s", sum(col("close")).over(frame))
      .withColumn("__m", count(lit(1)).over(frame))
      .select(col(keyCol), col("day"),
        (col("close").cast("double") / lit(100.0)).as("close"),
        (col("__s").cast("double") / col("__m").cast("double") /
          lit(100.0)).as("sma"),
        ((col("__s") * (lit(1000L) + permille)).cast("double") /
          (col("__m") * 1000L).cast("double") / lit(100.0)).as("upper"),
        ((col("__s") * (lit(1000L) - permille)).cast("double") /
          (col("__m") * 1000L).cast("double") / lit(100.0)).as("lower"),
        (col("close") * col("__m") * 1000L >
          col("__s") * (lit(1000L) + permille)).as("above_upper"),
        (col("close") * col("__m") * 1000L <
          col("__s") * (lit(1000L) - permille)).as("below_lower"))
      .orderBy(col(keyCol).asc, col("day").asc)
  }

  /** Disparity index 100·close/SMA-13 per key-day. */
  private[graft] def disparity(df: DataFrame, keyCol: String, tsCol: String,
                               valCol: String, tieBreak: String,
                               n: Int = DispN): DataFrame = {
    val frame = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(-(n - 1), Window.currentRow)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__s", sum(col("close")).over(frame))
      .withColumn("__m", count(lit(1)).over(frame))
      .select(col(keyCol), col("day"),
        (col("close").cast("double") / lit(100.0)).as("close"),
        ((col("close") * col("__m") * 100L).cast("double") /
          col("__s").cast("double")).as("disparity"))
      .orderBy(col(keyCol).asc, col("day").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_vwma" -> ((s, dir) =>
      vwma(Tables.events(s, dir), "user_id", "ts", "value", "event_id",
        "k")),
    "q_envelope" -> ((s, dir) =>
      envelope(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_disparity" -> ((s, dir) =>
      disparity(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")))

  private val BarsSql =
    """t AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id,
      |    props
      |  FROM events),
      |bars AS (
      |  SELECT user_id, day, max(cl) AS close
      |  FROM (
      |    SELECT user_id, day,
      |      last_value(c) OVER (PARTITION BY user_id, day
      |        ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |        AS cl
      |    FROM t)
      |  GROUP BY user_id, day)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_vwma" ->
      s"""WITH $BarsSql,
         |vols AS (
         |  SELECT user_id, CAST(ts AS DATE) AS day,
         |    CAST(sum(CAST(json_extract_string(props, '$$.k') AS BIGINT))
         |      AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2
         |  HAVING sum(CAST(json_extract_string(props, '$$.k') AS BIGINT))
         |    IS NOT NULL),
         |j AS (
         |  SELECT bars.user_id, bars.day, bars.close, vols.v
         |  FROM bars JOIN vols ON bars.user_id = vols.user_id
         |    AND bars.day = vols.day),
         |w AS (
         |  SELECT user_id, day, close,
         |    CAST(sum(close * v) OVER wf AS BIGINT) AS spv,
         |    CAST(sum(v) OVER wf AS BIGINT) AS sv
         |  FROM j
         |  WINDOW wf AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN ${VwmaN - 1} PRECEDING AND CURRENT ROW))
         |SELECT user_id, day, CAST(close AS DOUBLE) / 100.0 AS close,
         |  CASE WHEN sv > 0 THEN
         |    CAST(spv AS DOUBLE) / CAST(sv AS DOUBLE) / 100.0 END AS vwma
         |FROM w ORDER BY user_id, day""".stripMargin,

    "q_envelope" ->
      s"""WITH $BarsSql,
         |w AS (
         |  SELECT user_id, day, close,
         |    CAST(sum(close) OVER wf AS BIGINT) AS s,
         |    CAST(count(*) OVER wf AS BIGINT) AS m
         |  FROM bars
         |  WINDOW wf AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN ${EnvN - 1} PRECEDING AND CURRENT ROW))
         |SELECT user_id, day, CAST(close AS DOUBLE) / 100.0 AS close,
         |  CAST(s AS DOUBLE) / CAST(m AS DOUBLE) / 100.0 AS sma,
         |  CAST(s * ${1000 + EnvPermille} AS DOUBLE)
         |    / CAST(m * 1000 AS DOUBLE) / 100.0 AS upper,
         |  CAST(s * ${1000 - EnvPermille} AS DOUBLE)
         |    / CAST(m * 1000 AS DOUBLE) / 100.0 AS lower,
         |  close * m * 1000 > s * ${1000 + EnvPermille} AS above_upper,
         |  close * m * 1000 < s * ${1000 - EnvPermille} AS below_lower
         |FROM w ORDER BY user_id, day""".stripMargin,

    "q_disparity" ->
      s"""WITH $BarsSql,
         |w AS (
         |  SELECT user_id, day, close,
         |    CAST(sum(close) OVER wf AS BIGINT) AS s,
         |    CAST(count(*) OVER wf AS BIGINT) AS m
         |  FROM bars
         |  WINDOW wf AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN ${DispN - 1} PRECEDING AND CURRENT ROW))
         |SELECT user_id, day, CAST(close AS DOUBLE) / 100.0 AS close,
         |  CAST(close * m * 100 AS DOUBLE) / CAST(s AS DOUBLE)
         |    AS disparity
         |FROM w ORDER BY user_id, day""".stripMargin)
}
