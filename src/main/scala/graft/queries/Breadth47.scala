package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forty-eighth wave — risk-model validation: the out-of-sample VaR
  * backtest and the volatility cone.
  *
  *  - **q_var_backtest**: split each key's day-move series 60/40 by
  *    time, estimate historical VaR on the TRAIN window (the q_var_es
  *    rank-selection — k = ⌈n/5⌉-th smallest move, no interpolation),
  *    then count test-window exceptions (moves strictly below the VaR
  *    boundary) and score calibration with the Kupiec
  *    proportion-of-failures likelihood ratio. In-sample backtests are
  *    circular (the tail count equals k BY CONSTRUCTION); the time
  *    split is what makes the exception count informative.
  *  - **q_vol_cone**: per key and horizon h ∈ {3,5,10}, the
  *    distribution of rolling h-bar realized volatility — min, low
  *    quartile, low median, low upper-quartile, max, all RANK-PICKED
  *    from the integer radicand Σx² (exact BIGINT window sums, the
  *    q_realized_vol discipline), converted to vol = √(Σx²/h)/100 only
  *    at emit. The cone is the banding a risk screen draws around
  *    "normal" vol per horizon.
  *
  * Scale shape: both are one-pass window queries over the memoized
  * day-bar grid — per-key series are calendar-bounded, window sums are
  * integer (order-free), and the only doubles are terminal
  * divisions/sqrts of exactly-agreed integers. The Kupiec LR is a
  * transcendental of agreed doubles → 6-dp-rounded on both engines
  * (the q_parkinson stance). */
object Breadth47 {

  private[graft] val TrainNum = 3 // train fraction = 3/5
  private[graft] val TrainDen = 5
  private[graft] val TailDen = 5 // VaR tail = worst 1/5
  private[graft] val ConeHorizons = Seq(3, 5, 10)

  /** Day moves (cents) with per-key time index and count. */
  private def indexedDiffs(df: DataFrame, keyCol: String, tsCol: String,
                           valCol: String, tieBreak: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    val byDay = byKey.orderBy(col("day").asc)
    val bars = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .select(col(keyCol), col("day"), col("close"))
    bars
      .withColumn("__x", col("close") - lag(col("close"), 1).over(byDay))
      .filter(col("__x").isNotNull)
      .withColumn("__i", row_number().over(byDay).cast("long"))
      .withColumn("__n", count(lit(1)).over(byKey))
  }

  private[graft] def varBacktest(df: DataFrame, keyCol: String,
                                 tsCol: String, valCol: String,
                                 tieBreak: String): DataFrame = {
    val d = indexedDiffs(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__ntr", expr(s"($TrainNum * __n) div $TrainDen"))
    val train = d.filter(col("__i") <= col("__ntr"))
    val byTail = Window.partitionBy(col(keyCol))
      .orderBy(col("__x").asc, col("day").asc)
    val varPerKey = train
      .withColumn("__rt", row_number().over(byTail).cast("long"))
      .filter(col("__rt") <=
        expr(s"(__ntr + ${TailDen - 1}) div $TailDen"))
      .groupBy(col(keyCol))
      .agg(max(col("__ntr")).as("n_train"), max(col("__x")).as("__var_c"))
    val test = d.filter(col("__i") > col("__ntr"))
      .join(varPerKey, Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(max(col("n_train")).as("n_train"),
        count(lit(1)).as("n_test"),
        max(col("__var_c")).as("__var_c"),
        sum(when(col("__x") < col("__var_c"), 1L).otherwise(0L))
          .as("n_exceptions"))
    val p = lit(1.0) / lit(TailDen.toDouble)
    val xr = col("n_exceptions").cast("double") / col("n_test").cast("double")
    val lr = lit(-2.0) *
      ((col("n_test") - col("n_exceptions")).cast("double") * log(lit(1.0) - p)
        + col("n_exceptions").cast("double") * log(p)
        - (col("n_test") - col("n_exceptions")).cast("double") *
          log(lit(1.0) - xr)
        - col("n_exceptions").cast("double") * log(xr))
    test.select(col(keyCol), col("n_train"), col("n_test"),
      (-col("__var_c").cast("double") / lit(100.0)).as("var_loss"),
      col("n_exceptions"),
      (col("n_exceptions").cast("double") / col("n_test").cast("double"))
        .as("exception_rate"),
      when(col("n_exceptions") > 0 && col("n_exceptions") < col("n_test"),
        round(lr, 6)).as("kupiec_lr"))
  }

  private[graft] def volCone(df: DataFrame, keyCol: String, tsCol: String,
                             valCol: String, tieBreak: String): DataFrame = {
    val d = indexedDiffs(df, keyCol, tsCol, valCol, tieBreak)
    ConeHorizons.map { h =>
      val byDay = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      val frame = byDay.rowsBetween(-(h - 1), 0)
      val byR = Window.partitionBy(col(keyCol))
        .orderBy(col("__ss").asc, col("day").asc)
      val byKey = Window.partitionBy(col(keyCol))
      val win = d
        .withColumn("__ss", sum(col("__x") * col("__x")).over(frame))
        .filter(col("__i") >= h) // full windows only
        .withColumn("__rs", row_number().over(byR).cast("long"))
        .withColumn("__nw", count(lit(1)).over(byKey))
      def vol(c: org.apache.spark.sql.Column) =
        sqrt(c.cast("double") / lit(h.toDouble)) / lit(100.0)
      win.groupBy(col(keyCol))
        .agg(max(col("__nw")).as("n_windows"),
          min(col("__ss")).as("__lo"),
          max(when(col("__rs") === expr("(__nw + 3) div 4"), col("__ss")))
            .as("__q25"),
          max(when(col("__rs") === expr("(__nw + 1) div 2"), col("__ss")))
            .as("__med"),
          max(when(col("__rs") === expr("(3 * __nw + 3) div 4"), col("__ss")))
            .as("__q75"),
          max(col("__ss")).as("__hi"))
        .select(col(keyCol), lit(h).as("horizon"), col("n_windows"),
          vol(col("__lo")).as("vol_lo"), vol(col("__q25")).as("vol_q25"),
          vol(col("__med")).as("vol_med"), vol(col("__q75")).as("vol_q75"),
          vol(col("__hi")).as("vol_hi"))
    }.reduce(_ unionAll _)
  }

  val defs: Map[String, Q] = Map(
    "q_var_backtest" -> ((s, dir) =>
      varBacktest(Tables.events(s, dir), "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc)),
    "q_vol_cone" -> ((s, dir) =>
      volCone(Tables.events(s, dir), "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc, col("horizon").asc)))

  /** Tie-safe daily cent bars → indexed day moves (the Breadth25
    * prefix plus the per-key index/count). */
  private val idxSql =
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
      |  GROUP BY user_id, day),
      |d0 AS (
      |  SELECT user_id, day,
      |    close - lag(close) OVER (PARTITION BY user_id ORDER BY day) AS x
      |  FROM bars),
      |f AS (
      |  SELECT user_id, day, x,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
      |      AS BIGINT) AS i,
      |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
      |  FROM d0 WHERE x IS NOT NULL)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_var_backtest" ->
      s"""WITH $idxSql,
         |tr AS (SELECT *, ($TrainNum * n) // $TrainDen AS ntr FROM f),
         |vk AS (
         |  SELECT user_id, max(ntr) AS n_train, max(x) AS var_c FROM (
         |    SELECT user_id, x, ntr,
         |      row_number() OVER (PARTITION BY user_id ORDER BY x, day) AS rt
         |    FROM tr WHERE i <= ntr)
         |  WHERE rt <= (ntr + ${TailDen - 1}) // $TailDen
         |  GROUP BY user_id),
         |te AS (
         |  SELECT t.user_id, vk.n_train, count(*) AS n_test,
         |    max(vk.var_c) AS var_c,
         |    CAST(sum(CASE WHEN t.x < vk.var_c THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_exceptions
         |  FROM tr t JOIN vk ON vk.user_id = t.user_id
         |  WHERE t.i > t.ntr
         |  GROUP BY t.user_id, vk.n_train)
         |SELECT user_id, n_train, CAST(n_test AS BIGINT) AS n_test,
         |  -CAST(var_c AS DOUBLE) / 100.0 AS var_loss, n_exceptions,
         |  CAST(n_exceptions AS DOUBLE) / CAST(n_test AS DOUBLE)
         |    AS exception_rate,
         |  CASE WHEN n_exceptions > 0 AND n_exceptions < n_test THEN
         |    round(-2.0 * (
         |      CAST(n_test - n_exceptions AS DOUBLE)
         |        * ln(1.0 - 1.0 / ${TailDen}.0)
         |      + CAST(n_exceptions AS DOUBLE) * ln(1.0 / ${TailDen}.0)
         |      - CAST(n_test - n_exceptions AS DOUBLE)
         |        * ln(1.0 - CAST(n_exceptions AS DOUBLE)
         |            / CAST(n_test AS DOUBLE))
         |      - CAST(n_exceptions AS DOUBLE)
         |        * ln(CAST(n_exceptions AS DOUBLE)
         |            / CAST(n_test AS DOUBLE))), 6)
         |  END AS kupiec_lr
         |FROM te ORDER BY user_id""".stripMargin,

    "q_vol_cone" ->
      s"""WITH $idxSql,
         |${ConeHorizons.map(h =>
          s"""w$h AS (
             |  SELECT user_id, day, ss,
             |    CAST(row_number() OVER (PARTITION BY user_id
             |      ORDER BY ss, day) AS BIGINT) AS rs,
             |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS nw
             |  FROM (
             |    SELECT user_id, day, i,
             |      sum(x * x) OVER (PARTITION BY user_id ORDER BY day
             |        ROWS BETWEEN ${h - 1} PRECEDING AND CURRENT ROW) AS ss
             |    FROM f)
             |  WHERE i >= $h),
             |c$h AS (
             |  SELECT user_id, $h AS horizon, max(nw) AS n_windows,
             |    min(ss) AS lo,
             |    max(CASE WHEN rs = (nw + 3) // 4 THEN ss END) AS q25,
             |    max(CASE WHEN rs = (nw + 1) // 2 THEN ss END) AS med,
             |    max(CASE WHEN rs = (3 * nw + 3) // 4 THEN ss END) AS q75,
             |    max(ss) AS hi
             |  FROM w$h GROUP BY user_id)""".stripMargin).mkString(",\n")}
         |${ConeHorizons.map(h =>
          s"""SELECT user_id, horizon, n_windows,
             |  sqrt(CAST(lo AS DOUBLE) / ${h}.0) / 100.0 AS vol_lo,
             |  sqrt(CAST(q25 AS DOUBLE) / ${h}.0) / 100.0 AS vol_q25,
             |  sqrt(CAST(med AS DOUBLE) / ${h}.0) / 100.0 AS vol_med,
             |  sqrt(CAST(q75 AS DOUBLE) / ${h}.0) / 100.0 AS vol_q75,
             |  sqrt(CAST(hi AS DOUBLE) / ${h}.0) / 100.0 AS vol_hi
             |FROM c$h""".stripMargin).mkString("\nUNION ALL\n")}
         |ORDER BY user_id, horizon""".stripMargin)
}
