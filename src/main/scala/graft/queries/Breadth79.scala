package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Eightieth wave — rolling co-movement, post-shock drift, intraday
  * microstructure.
  *
  *  - **q_rolling_corr**: 10-bar rolling Pearson correlation of each
  *    key's day move against the market move — the normalized sibling
  *    of q_rolling_beta. Five integer window sums per bar, full
  *    windows only; the emit is the usual one-division-two-sqrt form
  *    on BIGINTs both engines cast identically.
  *  - **q_event_drift**: the post-shock event study — a shock is a day
  *    whose |move| strictly exceeds 4× the key's exact median |move|
  *    (the q_pot_exceed threshold, integer cross-multiplied); the
  *    3-day cumulative follow-through after each shock comes from one
  *    bounded lead-frame sum, and keys report mean drift per shock
  *    (aggregate ratio, ONE division).
  *  - **q_intraday_activity**: the intraday U-shape — mean |tick-to-
  *    tick move| by hour of day, tick-grain lags inside (key, day)
  *    partitions so no move crosses a session boundary. Integer sums;
  *    exercises `hour()` parity.
  *
  * Scale shape: rolling_corr/event_drift ride the memoized move grid
  * (bounded frames, |keys|-row outputs); intraday_activity is the one
  * tick-grain window this wave (a single (key, day) shuffle, the
  * same shape the bar build itself pays) into a 24-row aggregate. */
object Breadth79 {

  private[graft] val CorrW = 10
  private[graft] val DriftH = 3

  /** Rolling w-bar Pearson of key move vs market move. */
  private[graft] def rollingCorr(df: DataFrame, keyCol: String,
                                 tsCol: String, valCol: String,
                                 tieBreak: String,
                                 w: Int = CorrW): DataFrame = {
    val win = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(-(w - 1), Window.currentRow)
    val m = Breadth72.movesWithMarket(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__n", count(lit(1)).over(win))
      .withColumn("__sx", sum(col("__x")).over(win))
      .withColumn("__sy", sum(col("__m")).over(win))
      .withColumn("__sxy", sum(col("__x") * col("__m")).over(win))
      .withColumn("__sxx", sum(col("__x") * col("__x")).over(win))
      .withColumn("__syy", sum(col("__m") * col("__m")).over(win))
    val wl = lit(w.toLong)
    val num = wl * col("__sxy") - col("__sx") * col("__sy")
    val vx = wl * col("__sxx") - col("__sx") * col("__sx")
    val vy = wl * col("__syy") - col("__sy") * col("__sy")
    m.select(col(keyCol), col("day"),
      when(col("__n") === w && vx > 0 && vy > 0,
        num.cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
        .as("rolling_corr"))
      .orderBy(col(keyCol).asc, col("day").asc)
  }

  /** Mean h-day cumulative move after >4×median-|move| shocks. */
  private[graft] def eventDrift(df: DataFrame, keyCol: String,
                                tsCol: String, valCol: String,
                                tieBreak: String,
                                h: Int = DriftH): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(abs(col("__x")).asc, col("day").asc)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(1, h)
    val m = Breadth67.dayMoves(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__a", abs(col("__x")))
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__cnt", count(lit(1)).over(byKey))
      .withColumn("__med",
        max(when(col("__rn") === expr("(__cnt + 1) div 2"), col("__a")))
          .over(byKey))
      .withColumn("__car", sum(col("__x")).over(fwd))
      .withColumn("__nf", count(lit(1)).over(fwd))
    val shocks = m.filter(col("__a") > col("__med") * 4 &&
      col("__nf") === h)
    shocks.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_shocks"),
        sum(col("__car")).as("sum_drift_cents"))
      .select(col(keyCol), col("n_shocks"), col("sum_drift_cents"),
        (col("sum_drift_cents").cast("double") /
          col("n_shocks").cast("double")).as("mean_drift_cents"))
      .orderBy(col(keyCol).asc)
  }

  /** Mean |tick move| by hour of day (moves within (key, day) only). */
  private[graft] def intradayActivity(df: DataFrame, keyCol: String,
                                      tsCol: String, valCol: String,
                                      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol), col(tsCol).cast("date"))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    df.withColumn("__c",
        floor(col(valCol) * lit(100.0) + lit(0.5)).cast("long"))
      .withColumn("__d", col("__c") - lag(col("__c"), 1).over(w))
      .filter(col("__d").isNotNull)
      .groupBy(hour(col(tsCol)).as("hh"))
      .agg(count(lit(1)).as("n_moves"),
        sum(abs(col("__d"))).as("sum_abs_cents"))
      .select(col("hh"), col("n_moves"), col("sum_abs_cents"),
        (col("sum_abs_cents").cast("double") /
          col("n_moves").cast("double")).as("mean_abs_move_cents"))
      .orderBy(col("hh").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_rolling_corr" -> ((s, dir) =>
      rollingCorr(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_event_drift" -> ((s, dir) =>
      eventDrift(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_intraday_activity" -> ((s, dir) =>
      intradayActivity(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")))

  val oracle: Map[String, String] = Map(
    "q_rolling_corr" ->
      s"""WITH ${Breadth67.movesSql},
         |mk AS (SELECT day, CAST(sum(x) AS BIGINT) AS m FROM mv GROUP BY 1),
         |mm AS (SELECT mv.user_id, mv.day, mv.x, mk.m
         |  FROM mv JOIN mk USING (day)),
         |r AS (
         |  SELECT user_id, day,
         |    CAST(count(*) OVER ww AS BIGINT) AS n,
         |    CAST(sum(x) OVER ww AS BIGINT) AS sx,
         |    CAST(sum(m) OVER ww AS BIGINT) AS sy,
         |    CAST(sum(x * m) OVER ww AS BIGINT) AS sxy,
         |    CAST(sum(x * x) OVER ww AS BIGINT) AS sxx,
         |    CAST(sum(m * m) OVER ww AS BIGINT) AS syy
         |  FROM mm
         |  WINDOW ww AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN ${CorrW - 1} PRECEDING AND CURRENT ROW))
         |SELECT user_id, day,
         |  CASE WHEN n = $CorrW
         |    AND $CorrW * sxx - sx * sx > 0 AND $CorrW * syy - sy * sy > 0
         |    THEN CAST($CorrW * sxy - sx * sy AS DOUBLE)
         |      / (sqrt(CAST($CorrW * sxx - sx * sx AS DOUBLE))
         |        * sqrt(CAST($CorrW * syy - sy * sy AS DOUBLE)))
         |  END AS rolling_corr
         |FROM r ORDER BY user_id, day""".stripMargin,

    "q_event_drift" ->
      s"""WITH ${Breadth67.movesSql},
         |r AS (
         |  SELECT user_id, day, x, abs(x) AS a,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY abs(x), day) AS rn,
         |    count(*) OVER (PARTITION BY user_id) AS cnt,
         |    CAST(sum(x) OVER wf AS BIGINT) AS car,
         |    CAST(count(*) OVER wf AS BIGINT) AS nf
         |  FROM mv
         |  WINDOW wf AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN 1 FOLLOWING AND $DriftH FOLLOWING)),
         |md AS (
         |  SELECT user_id, x, a, car, nf,
         |    max(CASE WHEN rn = (cnt + 1) // 2 THEN a END)
         |      OVER (PARTITION BY user_id) AS med
         |  FROM r),
         |sh AS (SELECT * FROM md WHERE a > med * 4 AND nf = $DriftH)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_shocks,
         |  CAST(sum(car) AS BIGINT) AS sum_drift_cents,
         |  CAST(CAST(sum(car) AS BIGINT) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS mean_drift_cents
         |FROM sh GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_intraday_activity" ->
      """WITH t AS (
        |  SELECT user_id, ts, CAST(ts AS DATE) AS day,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, event_id
        |  FROM events),
        |d AS (
        |  SELECT hour(ts) AS hh,
        |    c - lag(c) OVER (PARTITION BY user_id, day
        |      ORDER BY ts, event_id) AS dd
        |  FROM t)
        |SELECT CAST(hh AS INTEGER) AS hh,
        |  CAST(count(*) AS BIGINT) AS n_moves,
        |  CAST(sum(abs(dd)) AS BIGINT) AS sum_abs_cents,
        |  CAST(CAST(sum(abs(dd)) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS mean_abs_move_cents
        |FROM d WHERE dd IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
