package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifty-ninth wave — dollar bars and the bar-scheme comparison.
  *
  *  - **q_dollar_bars**: value-driven bars — the q_volume_bars
  *    construction with the bucket advanced by traded VALUE (price ×
  *    quantity, integer cent-units) instead of quantity; the sampling
  *    scheme that stays calibrated when price levels drift an order of
  *    magnitude (a volume bar at 10× the price carries 10× the value;
  *    a dollar bar does not).
  *  - **q_bar_compare**: the empirical scheme comparison — per
  *    sampling scheme (time / volume / dollar), bar count and mean
  *    absolute open→close move, total as an integer sum with ONE
  *    terminal division. The table a resampling choice is made from:
  *    information-driven schemes show fewer idle bars and more uniform
  *    per-bar movement.
  *
  * Scale shape: identical to q_volume_bars (two key windows + one
  * aggregate); the comparison is a 3-row rollup of the three bar
  * frames. Int64 headroom: cum value ≲ 10⁴·10²·rows — re-base units
  * at ~10¹⁴-cent-unit keys. */
object Breadth58 {

  private[graft] val DollarUnit = 2000000L // cent·qty units per bar

  private[graft] def dollarBars(df: DataFrame, keyCol: String, tsCol: String,
                                valCol: String, tieBreak: String,
                                qtyJsonField: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    val run = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bar = Window.partitionBy(col(keyCol), col("bar_id"))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df
      .withColumn("__c", (floor(col(valCol) * lit(100.0) + lit(0.5)))
        .cast("long"))
      .withColumn("__v", coalesce(
        get_json_object(col("props"), s"$$.$qtyJsonField").cast("long"),
        lit(0L)))
      .withColumn("__dv", col("__c") * col("__v"))
      .withColumn("__cum", sum(col("__dv")).over(run))
      .withColumn("bar_id", expr(s"(__cum - __dv) div $DollarUnit"))
      .withColumn("__open", first(col("__c")).over(bar))
      .withColumn("__close", last(col("__c")).over(bar))
      .groupBy(col(keyCol), col("bar_id"))
      .agg(count(lit(1)).as("n_ticks"), sum(col("__dv")).as("value"),
        max(col("__open")).as("open"), max(col("__close")).as("close"),
        max(col("__c")).as("high"), min(col("__c")).as("low"))
      .orderBy(col(keyCol).asc, col("bar_id").asc)
  }

  private[graft] def barCompare(df: DataFrame, keyCol: String, tsCol: String,
                                valCol: String, tieBreak: String,
                                qtyJsonField: String): DataFrame = {
    def summarize(scheme: String, bars: DataFrame): DataFrame =
      bars.agg(count(lit(1)).as("n_bars"),
        sum(abs(col("close") - col("open"))).as("total_abs_move_cents"))
        .select(lit(scheme).as("scheme"), col("n_bars"),
          col("total_abs_move_cents"),
          (col("total_abs_move_cents").cast("double") /
            (col("n_bars") * lit(100L)).cast("double")).as("mean_abs_move"))
    val time = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
    val vol = Breadth56.volumeBars(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)
    val dlr = dollarBars(df, keyCol, tsCol, valCol, tieBreak, qtyJsonField)
    Seq(summarize("dollar", dlr), summarize("time", time),
      summarize("volume", vol))
      .reduce(_ unionAll _).orderBy(col("scheme").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_dollar_bars" -> ((s, dir) =>
      dollarBars(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id", "k")),
    "q_bar_compare" -> ((s, dir) =>
      barCompare(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id", "k")))

  private val dollarTicksSql =
    s"""t AS (
       |  SELECT user_id, ts, event_id,
       |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
       |    CAST(floor(value * 100.0 + 0.5) AS BIGINT)
       |      * coalesce(CAST(json_extract_string(props, '$$.k') AS BIGINT), 0)
       |      AS dv
       |  FROM events),
       |s AS (
       |  SELECT user_id, ts, event_id, c, dv,
       |    CAST(sum(dv) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum
       |  FROM t),
       |g AS (
       |  SELECT user_id, ts, event_id, c, dv,
       |    (cum - dv) // $DollarUnit AS bar_id
       |  FROM s),
       |ob AS (
       |  SELECT user_id, bar_id, c, dv,
       |    first_value(c) OVER wb AS op, last_value(c) OVER wb AS cl
       |  FROM g
       |  WINDOW wb AS (PARTITION BY user_id, bar_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
       |dbars AS (
       |  SELECT user_id, bar_id, CAST(count(*) AS BIGINT) AS n_ticks,
       |    CAST(sum(dv) AS BIGINT) AS value, max(op) AS open,
       |    max(cl) AS close, max(c) AS high, min(c) AS low
       |  FROM ob GROUP BY user_id, bar_id)""".stripMargin

  /** Volume-bar CTE chain reusing Breadth56's definition, renamed to
    * coexist with the dollar chain. */
  private val volBarsSql =
    s"""vt AS (
       |  SELECT user_id, ts, event_id,
       |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
       |    coalesce(CAST(json_extract_string(props, '$$.k') AS BIGINT), 0)
       |      AS v
       |  FROM events),
       |vs AS (
       |  SELECT user_id, ts, event_id, c, v,
       |    CAST(sum(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum
       |  FROM vt),
       |vg AS (
       |  SELECT user_id, ts, event_id, c,
       |    (cum - v) // ${Breadth56.BarVol} AS bar_id
       |  FROM vs),
       |vob AS (
       |  SELECT user_id, bar_id, c,
       |    first_value(c) OVER wb AS op, last_value(c) OVER wb AS cl
       |  FROM vg
       |  WINDOW wb AS (PARTITION BY user_id, bar_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
       |vbars AS (
       |  SELECT user_id, bar_id, max(op) AS open, max(cl) AS close
       |  FROM vob GROUP BY user_id, bar_id)""".stripMargin

  private val timeBarsSql =
    """tt AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id
      |  FROM events),
      |tbars AS (
      |  SELECT user_id, day, max(op) AS open, max(cl) AS close
      |  FROM (
      |    SELECT user_id, day, c,
      |      first_value(c) OVER (PARTITION BY user_id, day ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS op,
      |      last_value(c) OVER (PARTITION BY user_id, day ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cl
      |    FROM tt)
      |  GROUP BY user_id, day)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_dollar_bars" ->
      s"""WITH $dollarTicksSql
         |SELECT user_id, bar_id, n_ticks, value, open, close, high, low
         |FROM dbars ORDER BY user_id, bar_id""".stripMargin,

    "q_bar_compare" ->
      s"""WITH $dollarTicksSql,
         |$volBarsSql,
         |$timeBarsSql
         |SELECT 'dollar' AS scheme, CAST(count(*) AS BIGINT) AS n_bars,
         |  CAST(sum(abs(close - open)) AS BIGINT) AS total_abs_move_cents,
         |  CAST(sum(abs(close - open)) AS DOUBLE)
         |    / CAST(count(*) * 100 AS DOUBLE) AS mean_abs_move
         |FROM dbars
         |UNION ALL
         |SELECT 'time', CAST(count(*) AS BIGINT),
         |  CAST(sum(abs(close - open)) AS BIGINT),
         |  CAST(sum(abs(close - open)) AS DOUBLE)
         |    / CAST(count(*) * 100 AS DOUBLE)
         |FROM tbars
         |UNION ALL
         |SELECT 'volume', CAST(count(*) AS BIGINT),
         |  CAST(sum(abs(close - open)) AS BIGINT),
         |  CAST(sum(abs(close - open)) AS DOUBLE)
         |    / CAST(count(*) * 100 AS DOUBLE)
         |FROM vbars
         |ORDER BY scheme""".stripMargin)
}
