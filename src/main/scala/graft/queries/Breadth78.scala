package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventy-ninth wave — calendar seasonality (monthly), drawdown
  * anatomy, threshold exceedances.
  *
  *  - **q_month_effect**: the monthly seasonal — mean day-bar cent
  *    move and up-share per calendar month across all keys (the
  *    q_weekday_effect shape at the month grain; exercises `month()`
  *    parity). Two integer sums + one count per group.
  *  - **q_dd_episodes**: drawdown episode anatomy per key — maximal
  *    runs of days strictly below the running close peak, counted by
  *    the gaps-and-islands start-flag trick (an episode starts where
  *    the previous day was AT the peak), with mean/max episode length
  *    derived from integer day counts. One division.
  *  - **q_pot_exceed**: peak-over-threshold exceedance counts — days
  *    whose |move| exceeds 2× and 4× the key's exact rank-selected
  *    MEDIAN |move| (thresholds by integer CROSS-MULTIPLICATION,
  *    |x| > m·k, never a float quantile), plus the exceedance share.
  *
  * Scale shape: all three ride the memoized grids — month_effect is a
  * 12-row aggregate, dd_episodes/pot_exceed are per-key ordered
  * windows + |keys|-row aggregates. */
object Breadth78 {

  /** Mean move + up-share per calendar month over all keys. */
  private[graft] def monthEffect(df: DataFrame, keyCol: String,
                                 tsCol: String, valCol: String,
                                 tieBreak: String): DataFrame =
    Breadth67.dayMoves(df, keyCol, tsCol, valCol, tieBreak)
      .groupBy(month(col("day")).as("month"))
      .agg(count(lit(1)).as("n_moves"),
        sum(col("__x")).as("sum_move_cents"),
        sum(when(col("__x") > 0, lit(1L)).otherwise(lit(0L))).as("__up"))
      .select(col("month"), col("n_moves"), col("sum_move_cents"),
        (col("sum_move_cents").cast("double") /
          col("n_moves").cast("double")).as("mean_move_cents"),
        (col("__up").cast("double") /
          col("n_moves").cast("double")).as("up_share"))
      .orderBy(col("month").asc)

  /** Drawdown episode count + mean/max length per key. */
  private[graft] def ddEpisodes(df: DataFrame, keyCol: String,
                                tsCol: String, valCol: String,
                                tieBreak: String): DataFrame = {
    val upTo = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val flagged = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__under",
        (col("close") < max(col("close")).over(upTo)).cast("long"))
      .withColumn("__start",
        when(col("__under") === 1 &&
          coalesce(lag(col("__under"), 1).over(w), lit(0L)) === 0, 1L)
          .otherwise(0L))
    flagged.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum(col("__under")).as("days_under"),
        sum(col("__start")).as("n_episodes"))
      .select(col(keyCol), col("n_days"), col("days_under"),
        col("n_episodes"),
        when(col("n_episodes") > 0,
          col("days_under").cast("double") /
            col("n_episodes").cast("double")).as("mean_episode_days"))
      .orderBy(col(keyCol).asc)
  }

  /** |move| exceedances over 2× / 4× the exact median |move| per key. */
  private[graft] def potExceed(df: DataFrame, keyCol: String, tsCol: String,
                               valCol: String, tieBreak: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(abs(col("__x")).asc, col("day").asc)
    val m = Breadth67.dayMoves(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__a", abs(col("__x")))
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__cnt", count(lit(1)).over(byKey))
      .withColumn("__med",
        max(when(col("__rn") === expr("(__cnt + 1) div 2"), col("__a")))
          .over(byKey))
    m.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_moves"),
        max(col("__med")).as("median_abs_move"),
        sum(when(col("__a") > col("__med") * 2, lit(1L)).otherwise(lit(0L)))
          .as("n_over_2x"),
        sum(when(col("__a") > col("__med") * 4, lit(1L)).otherwise(lit(0L)))
          .as("n_over_4x"))
      .select(col(keyCol), col("n_moves"), col("median_abs_move"),
        col("n_over_2x"), col("n_over_4x"),
        (col("n_over_2x").cast("double") / col("n_moves").cast("double"))
          .as("exceed_share_2x"))
      .orderBy(col(keyCol).asc)
  }

  val defs: Map[String, Q] = Map(
    "q_month_effect" -> ((s, dir) =>
      monthEffect(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_dd_episodes" -> ((s, dir) =>
      ddEpisodes(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_pot_exceed" -> ((s, dir) =>
      potExceed(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")))

  val oracle: Map[String, String] = Map(
    "q_month_effect" ->
      s"""WITH ${Breadth67.movesSql}
         |SELECT CAST(month(day) AS INTEGER) AS month,
         |  CAST(count(*) AS BIGINT) AS n_moves,
         |  CAST(sum(x) AS BIGINT) AS sum_move_cents,
         |  CAST(CAST(sum(x) AS BIGINT) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS mean_move_cents,
         |  CAST(CAST(sum(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS up_share
         |FROM mv GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_dd_episodes" ->
      s"""WITH ${Breadth67.movesSql},
         |f AS (
         |  SELECT user_id, day,
         |    CASE WHEN close < max(close) OVER (PARTITION BY user_id
         |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND
         |      CURRENT ROW) THEN 1 ELSE 0 END AS und
         |  FROM bars),
         |s AS (
         |  SELECT user_id, und,
         |    CASE WHEN und = 1 AND coalesce(lag(und) OVER (
         |      PARTITION BY user_id ORDER BY day), 0) = 0
         |    THEN 1 ELSE 0 END AS st
         |  FROM f)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
         |  CAST(sum(und) AS BIGINT) AS days_under,
         |  CAST(sum(st) AS BIGINT) AS n_episodes,
         |  CASE WHEN sum(st) > 0
         |    THEN CAST(CAST(sum(und) AS BIGINT) AS DOUBLE)
         |      / CAST(CAST(sum(st) AS BIGINT) AS DOUBLE) END
         |    AS mean_episode_days
         |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_pot_exceed" ->
      s"""WITH ${Breadth67.movesSql},
         |r AS (
         |  SELECT user_id, day, abs(x) AS a,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY abs(x), day) AS rn,
         |    count(*) OVER (PARTITION BY user_id) AS cnt
         |  FROM mv),
         |md AS (
         |  SELECT user_id, a,
         |    max(CASE WHEN rn = (cnt + 1) // 2 THEN a END)
         |      OVER (PARTITION BY user_id) AS med
         |  FROM r)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_moves,
         |  CAST(max(med) AS BIGINT) AS median_abs_move,
         |  CAST(sum(CASE WHEN a > med * 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_over_2x,
         |  CAST(sum(CASE WHEN a > med * 4 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_over_4x,
         |  CAST(CAST(sum(CASE WHEN a > med * 2 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS exceed_share_2x
         |FROM md GROUP BY user_id ORDER BY user_id""".stripMargin)
}
