package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ninetieth wave — engagement metrics without distinct-over-window.
  *
  *  - **q_stickiness**: DAU / MAU(28) per day. The classic formulation
  *    needs a 28-day rolling COUNT DISTINCT user — a shuffle-heavy
  *    set union at scale. Re-expressed exactly as a sweep: each user's
  *    active days extend to [day, day+27] "counts toward MAU"
  *    intervals, merged per user into islands (so overlapping windows
  *    never double-count), then one global +1/−1 day-grain sweep gives
  *    MAU(d) with integer arithmetic only. DAU is a plain groupBy.
  *  - **q_l28_histogram**: the power-user curve — how many users were
  *    active on exactly k of the trailing 28 days (k = 1..28, at the
  *    corpus's last day). Two groupBys over (user, day) pairs.
  *  - **q_new_returning**: per day, users seen for the first time ever
  *    vs returning users — min-day-per-user joined back to the daily
  *    actives, counts only.
  *
  * Scale shape: everything aggregates (user, day) pairs map-side
  * first; the MAU sweep walks a |days|-bounded delta table after a
  * per-user island merge (per-user ordered window over that user's
  * active days). No collect_set, no distinct-over-window, no
  * row-multiplying join. */
object Breadth89 {

  private[graft] val MauWin = 28

  /** Distinct (user, day) activity pairs. */
  private def activity(df: DataFrame, keyCol: String,
                       tsCol: String): DataFrame =
    df.select(col(keyCol).as("__u"), col(tsCol).cast("date").as("__d"))
      .distinct()

  /** DAU / MAU(28) per day via the merged-interval sweep. */
  private[graft] def stickiness(df: DataFrame, keyCol: String,
                                tsCol: String,
                                win: Int = MauWin): DataFrame = {
    val act = activity(df, keyCol, tsCol)
    val dau = act.groupBy(col("__d").as("day"))
      .agg(count(lit(1)).as("dau"))
    // per-user MAU-contribution intervals [d, d+27], merged: a user
    // counts toward MAU(x) iff x lies in one of their islands.
    val w = Window.partitionBy(col("__u")).orderBy(col("__d").asc)
    val prevMax = max(col("__e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val islands = act
      .withColumn("__e", date_add(col("__d"), win - 1))
      .withColumn("__new",
        when(prevMax.isNull || col("__d") > prevMax, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__u"), col("__isl"))
      .agg(min(col("__d")).as("isl_s"), max(col("__e")).as("isl_e"))
    // fold the DAU days in with zero deltas so the running level has a
    // row at EVERY observation day, not only at island boundaries
    val deltas = islands.select(col("isl_s").as("__day"), lit(1L).as("__x"))
      .unionAll(islands.select(date_add(col("isl_e"), 1).as("__day"),
        lit(-1L).as("__x")))
      .unionAll(dau.select(col("day").as("__day"), lit(0L).as("__x")))
      .groupBy(col("__day")).agg(sum(col("__x")).as("__net"))
    val sweep = Window.orderBy(col("__day").asc)
    val mau = deltas
      .withColumn("mau", sum(col("__net"))
        .over(sweep.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .select(col("__day"), col("mau"))
    dau.join(mau, col("day") === col("__day"))
      .select(col("day"), col("dau"), col("mau"),
        (col("dau").cast("double") / col("mau").cast("double"))
          .as("stickiness"))
      .orderBy(col("day").asc)
  }

  /** Users active on exactly k of the trailing `win` days. */
  private[graft] def l28Histogram(df: DataFrame, keyCol: String,
                                  tsCol: String,
                                  win: Int = MauWin): DataFrame = {
    val act = activity(df, keyCol, tsCol)
    val last = act.agg(max(col("__d")).as("__last"))
    act.crossJoin(broadcast(last))
      .filter(datediff(col("__last"), col("__d")) < win)
      .groupBy(col("__u"))
      .agg(count(lit(1)).as("active_days"))
      .groupBy(col("active_days"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("active_days").asc)
  }

  /** New vs returning user counts per day. */
  private[graft] def newReturning(df: DataFrame, keyCol: String,
                                  tsCol: String): DataFrame = {
    val act = activity(df, keyCol, tsCol)
    val first = act.groupBy(col("__u")).agg(min(col("__d")).as("__f"))
    act.join(first, Seq("__u"))
      .groupBy(col("__d").as("day"))
      .agg(sum(when(col("__d") === col("__f"), 1L).otherwise(0L))
          .as("new_users"),
        sum(when(col("__d") =!= col("__f"), 1L).otherwise(0L))
          .as("returning_users"))
      .orderBy(col("day").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_stickiness" -> ((s, dir) =>
      stickiness(Tables.events(s, dir), "user_id", "ts")),
    "q_l28_histogram" -> ((s, dir) =>
      l28Histogram(Tables.events(s, dir), "user_id", "ts")),
    "q_new_returning" -> ((s, dir) =>
      newReturning(Tables.events(s, dir), "user_id", "ts")))

  val oracle: Map[String, String] = Map(
    "q_stickiness" ->
      s"""WITH act AS (
         |  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
         |  FROM events),
         |dau AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS dau
         |  FROM act GROUP BY 1),
         |iv AS (
         |  SELECT u, d, d + ${MauWin - 1} AS e,
         |    CASE WHEN max(d + ${MauWin - 1}) OVER (PARTITION BY u
         |        ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
         |        AND 1 PRECEDING) IS NULL
         |      OR d > max(d + ${MauWin - 1}) OVER (PARTITION BY u
         |        ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
         |        AND 1 PRECEDING)
         |      THEN 1 ELSE 0 END AS newisl
         |  FROM act),
         |isl AS (
         |  SELECT u,
         |    sum(newisl) OVER (PARTITION BY u ORDER BY d
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g,
         |    d, e
         |  FROM iv),
         |islands AS (
         |  SELECT u, g, min(d) AS isl_s, max(e) AS isl_e
         |  FROM isl GROUP BY 1, 2),
         |deltas AS (
         |  SELECT day, CAST(sum(x) AS BIGINT) AS net FROM (
         |    SELECT isl_s AS day, 1 AS x FROM islands
         |    UNION ALL
         |    SELECT isl_e + 1 AS day, -1 AS x FROM islands
         |    UNION ALL
         |    SELECT day, 0 AS x FROM dau)
         |  GROUP BY 1),
         |mau AS (
         |  SELECT day,
         |    CAST(sum(net) OVER (ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS mau
         |  FROM deltas)
         |SELECT dau.day, dau, mau.mau AS mau,
         |  CAST(dau AS DOUBLE) / CAST(mau.mau AS DOUBLE) AS stickiness
         |FROM dau JOIN mau ON dau.day = mau.day
         |ORDER BY dau.day""".stripMargin,

    "q_l28_histogram" ->
      s"""WITH act AS (
         |  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
         |  FROM events),
         |mx AS (SELECT max(d) AS lastd FROM act),
         |k AS (
         |  SELECT u, CAST(count(*) AS BIGINT) AS active_days
         |  FROM act, mx
         |  WHERE date_diff('day', d, lastd) < $MauWin
         |  GROUP BY 1)
         |SELECT active_days, CAST(count(*) AS BIGINT) AS n_users
         |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_new_returning" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
        |  FROM events),
        |f AS (SELECT u, min(d) AS fd FROM act GROUP BY 1)
        |SELECT d AS day,
        |  CAST(sum(CASE WHEN d = fd THEN 1 ELSE 0 END) AS BIGINT)
        |    AS new_users,
        |  CAST(sum(CASE WHEN d <> fd THEN 1 ELSE 0 END) AS BIGINT)
        |    AS returning_users
        |FROM act JOIN f USING (u)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
