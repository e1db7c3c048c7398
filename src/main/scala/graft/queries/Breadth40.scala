package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fortieth wave — breadth participation and cross-sectional risk:
  *
  *  - **percent above MA**: per day, the share of keys closing above
  *    their own trailing 20-bar mean — the comparison stays INTEGER
  *    (20·close > Σcloses, no division per key), one terminal share
  *    division per day;
  *  - **cross-sectional dispersion**: per day, the spread of same-day
  *    cent moves across keys — σ via integer moments
  *    (√(n·Σx² − (Σx)²)/n, the dailySharpe algebra turned sideways),
  *    the "is this a stock-picker's market" diagnostic.
  *
  * Scale shape: both ride the memoized bar grid with one key window /
  * lag, then one day-keyed aggregate (|days| rows out). */
object Breadth40 {

  private[graft] val PamW = 20

  /** Percent of keys above their trailing 20-bar mean, per day (full
    * windows only; the above test is the integer cross-multiplication
    * 20·close > Σcloses). */
  private[graft] def pctAboveMa(df: DataFrame, keyCol: String, tsCol: String,
                                valCol: String, tieBreak: String): DataFrame = {
    val f = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(-(PamW - 1), 0)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__n", count(lit(1)).over(f))
      .withColumn("__s", sum(col("close")).over(f))
      .filter(col("__n") === PamW)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_scored"),
        sum(when(col("close") * PamW > col("__s"), 1L).otherwise(0L))
          .as("n_above"))
      .select(col("day"), col("n_scored"), col("n_above"),
        (col("n_above").cast("double") / col("n_scored").cast("double"))
          .as("pct_above"))
  }

  /** Cross-sectional dispersion of same-day cent moves: per day with
    * ≥2 scored keys, σ = √(n·Σx² − (Σx)²)/n — integer radicand, one
    * sqrt, one division. */
  private[graft] def dispersion(df: DataFrame, keyCol: String, tsCol: String,
                                valCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__x", col("close") - lag(col("close"), 1).over(w))
      .filter(col("__x").isNotNull)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .filter(col("n_keys") >= 2)
      .select(col("day"), col("n_keys"),
        (sqrt((col("n_keys") * col("__sxx") - col("__sx") * col("__sx"))
          .cast("double")) / col("n_keys").cast("double"))
          .as("dispersion_cents"))
  }

  val defs: Map[String, Q] = Map(
    // Share of keys above their own 20-bar mean, per day.
    "q_pct_above_ma" -> ((s, dir) =>
      pctAboveMa(Tables.events(s, dir), "user_id", "ts", "value", "event_id")
        .orderBy(col("day").asc)),

    // Cross-sectional move dispersion per day.
    "q_dispersion" -> ((s, dir) =>
      dispersion(Tables.events(s, dir), "user_id", "ts", "value", "event_id")
        .orderBy(col("day").asc)))

  private val barsSql =
    """t AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id
      |  FROM events),
      |bars AS (
      |  SELECT user_id, day, max(cl) AS close
      |  FROM (
      |    SELECT user_id, day,
      |      last_value(c) OVER (PARTITION BY user_id, day ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cl
      |    FROM t)
      |  GROUP BY user_id, day)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_pct_above_ma" ->
      s"""WITH $barsSql,
         |f AS (
         |  SELECT user_id, day, close,
         |    count(*) OVER w AS n,
         |    CAST(sum(close) OVER w AS BIGINT) AS s
         |  FROM bars
         |  WINDOW w AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN ${PamW - 1} PRECEDING AND CURRENT ROW))
         |SELECT day, count(*) AS n_scored,
         |  CAST(sum(CASE WHEN close * $PamW > s THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_above,
         |  CAST(sum(CASE WHEN close * $PamW > s THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS pct_above
         |FROM f WHERE n = $PamW GROUP BY day ORDER BY day""".stripMargin,

    "q_dispersion" ->
      s"""WITH $barsSql,
         |d AS (
         |  SELECT user_id, day,
         |    close - lag(close) OVER (PARTITION BY user_id ORDER BY day) AS x
         |  FROM bars)
         |SELECT day, count(*) AS n_keys,
         |  sqrt(CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE))
         |    / CAST(count(*) AS DOUBLE) AS dispersion_cents
         |FROM d WHERE x IS NOT NULL
         |GROUP BY day HAVING count(*) >= 2 ORDER BY day""".stripMargin)
}
