package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifty-seventh wave — information-driven bars: volume bars and VPIN.
  *
  * Time bars sample when the CLOCK ticks; volume bars sample when the
  * MARKET does (López de Prado's information-driven bars) — the
  * resampling that keeps per-bar information content roughly constant
  * across quiet and busy regimes:
  *
  *  - **q_volume_bars**: per key, ticks grouped into consecutive
  *    500-unit volume buckets (bar id = pre-tick cumulative volume div
  *    500 — a prefix sum + integer division, so bar boundaries are
  *    exact and a tick straddling a boundary belongs to the bar its
  *    FIRST unit lands in), with per-bar OHLC in integer cents and the
  *    tick/volume tallies.
  *  - **q_vpin**: the volume-synchronized probability of informed
  *    trading over those bars — tick-rule signed volume (sign of the
  *    tick-to-tick price change; zero-change and first ticks count 0),
  *    per-bar imbalance |Σ signed| summed across bars over total
  *    volume: Σ|·|/Σv as a RATIO OF INTEGER SUMS (one terminal
  *    division — the mean-of-ratios float form would be
  *    order-dependent).
  *
  * Scale shape: two key-partitioned windows (prefix sums) + one
  * (key, bar) aggregate; per-key series are the tick history, windowed
  * by key — the same distribution every recurrence query uses. */
object Breadth56 {

  private[graft] val BarVol = 500L

  /** Ticks with cents, per-key order, volume, signed volume and the
    * volume-bar id. */
  private def signedTicks(df: DataFrame, keyCol: String, tsCol: String,
                          valCol: String, tieBreak: String,
                          qtyJsonField: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    val run = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("__c", (floor(col(valCol) * lit(100.0) + lit(0.5)))
        .cast("long"))
      .withColumn("__v", coalesce(
        get_json_object(col("props"), s"$$.$qtyJsonField").cast("long"),
        lit(0L)))
      .withColumn("__pc", lag(col("__c"), 1).over(byKey))
      .withColumn("__sv",
        when(col("__pc").isNull || col("__c") === col("__pc"), lit(0L))
          .when(col("__c") > col("__pc"), col("__v"))
          .otherwise(-col("__v")))
      .withColumn("__cum", sum(col("__v")).over(run))
      .withColumn("bar_id", expr(s"(__cum - __v) div $BarVol"))
  }

  private[graft] def volumeBars(df: DataFrame, keyCol: String, tsCol: String,
                                valCol: String, tieBreak: String,
                                qtyJsonField: String): DataFrame = {
    val bar = Window.partitionBy(col(keyCol), col("bar_id"))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    signedTicks(df, keyCol, tsCol, valCol, tieBreak, qtyJsonField)
      .withColumn("__open", first(col("__c")).over(bar))
      .withColumn("__close", last(col("__c")).over(bar))
      .groupBy(col(keyCol), col("bar_id"))
      .agg(count(lit(1)).as("n_ticks"), sum(col("__v")).as("vol"),
        max(col("__open")).as("open"), max(col("__close")).as("close"),
        max(col("__c")).as("high"), min(col("__c")).as("low"))
      .orderBy(col(keyCol).asc, col("bar_id").asc)
  }

  private[graft] def vpin(df: DataFrame, keyCol: String, tsCol: String,
                          valCol: String, tieBreak: String,
                          qtyJsonField: String): DataFrame =
    signedTicks(df, keyCol, tsCol, valCol, tieBreak, qtyJsonField)
      .groupBy(col(keyCol), col("bar_id"))
      .agg(abs(sum(col("__sv"))).as("__imb"), sum(col("__v")).as("__bv"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_bars"), sum(col("__bv")).as("vol_total"),
        sum(col("__imb")).as("__imb_total"))
      .select(col(keyCol), col("n_bars"), col("vol_total"),
        (col("__imb_total").cast("double") / col("vol_total").cast("double"))
          .as("vpin"))
      .orderBy(col(keyCol).asc)

  val defs: Map[String, Q] = Map(
    "q_volume_bars" -> ((s, dir) =>
      volumeBars(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id", "k")),
    "q_vpin" -> ((s, dir) =>
      vpin(Tables.events(s, dir), "user_id", "ts", "value", "event_id",
        "k")))

  private val ticksSql =
    s"""t AS (
       |  SELECT user_id, ts, event_id,
       |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
       |    coalesce(CAST(json_extract_string(props, '$$.k') AS BIGINT), 0)
       |      AS v
       |  FROM events),
       |s AS (
       |  SELECT user_id, ts, event_id, c, v,
       |    lag(c) OVER w AS pc,
       |    CAST(sum(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum
       |  FROM t
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |g AS (
       |  SELECT user_id, ts, event_id, c, v,
       |    CASE WHEN pc IS NULL OR c = pc THEN 0
       |         WHEN c > pc THEN v ELSE -v END AS sv,
       |    (cum - v) // $BarVol AS bar_id
       |  FROM s)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_volume_bars" ->
      s"""WITH $ticksSql,
         |ob AS (
         |  SELECT user_id, bar_id, c, v,
         |    first_value(c) OVER wb AS op, last_value(c) OVER wb AS cl
         |  FROM g
         |  WINDOW wb AS (PARTITION BY user_id, bar_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
         |SELECT user_id, bar_id, CAST(count(*) AS BIGINT) AS n_ticks,
         |  CAST(sum(v) AS BIGINT) AS vol, max(op) AS open,
         |  max(cl) AS close, max(c) AS high, min(c) AS low
         |FROM ob GROUP BY user_id, bar_id
         |ORDER BY user_id, bar_id""".stripMargin,

    "q_vpin" ->
      s"""WITH $ticksSql,
         |pb AS (
         |  SELECT user_id, bar_id, abs(CAST(sum(sv) AS BIGINT)) AS imb,
         |    CAST(sum(v) AS BIGINT) AS bv
         |  FROM g GROUP BY user_id, bar_id)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_bars,
         |  CAST(sum(bv) AS BIGINT) AS vol_total,
         |  CAST(sum(imb) AS DOUBLE) / CAST(sum(bv) AS DOUBLE) AS vpin
         |FROM pb GROUP BY user_id ORDER BY user_id""".stripMargin)
}
