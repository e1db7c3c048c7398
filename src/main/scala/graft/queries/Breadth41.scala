package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forty-first wave — a hypothesis test and the cross-sectional
  * momentum factor:
  *
  *  - **runs test** (Wald–Wolfowitz) per key: are up/down day signs
  *    random? Runs R, sign counts n₊/n₋ are INTEGER (flat days drop);
  *    the z-score is the classic fixed scalar chain
  *    z = (R − μ)/σ with μ = 2n₊n₋/n + 1 and
  *    σ² = (μ−1)(μ−2)/(n−1) — identical operand order in the oracle;
  *  - **momentum rank**: per day, keys ranked by their trailing
  *    20-bar return (one division each — both engines compute the
  *    SAME double — ties broken by key), plus the decile bucket the
  *    long/short screens consume.
  *
  * Scale shape: runs test is one lag + one hash aggregate per key;
  * momentum rank is one key window (the 20-bar base) + one day window
  * over the |keys|·|days| grid. */
object Breadth41 {

  private[graft] val MomW = 20

  /** Runs test per key over up/down day signs (flat days drop; keys
    * need both signs present and ≥3 scored days — σ > 0). A run
    * boundary is a sign CHANGE between consecutive scored days. */
  private[graft] def runsTest(df: DataFrame, keyCol: String, tsCol: String,
                              valCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val signed = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__x", col("close") - lag(col("close"), 1).over(w))
      .filter(col("__x").isNotNull && col("__x") =!= 0)
      .withColumn("__s", when(col("__x") > 0, 1L).otherwise(-1L))
      .withColumn("__ps", lag(col("__s"), 1).over(
        Window.partitionBy(col(keyCol)).orderBy(col("day").asc)))
    val g = signed.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_signs"),
        sum(when(col("__s") === 1L, 1L).otherwise(0L)).as("n_up"),
        sum(when(col("__s") === -1L, 1L).otherwise(0L)).as("n_down"),
        (sum(when(col("__ps").isNull || col("__s") =!= col("__ps"), 1L)
          .otherwise(0L))).as("n_runs"))
    val mu = lit(2.0) * (col("n_up") * col("n_down")).cast("double") /
      col("n_signs").cast("double") + lit(1.0)
    g.select(col(keyCol), col("n_signs"), col("n_up"), col("n_down"),
      col("n_runs"),
      when(col("n_up") > 0 && col("n_down") > 0 && col("n_signs") >= 3,
        (col("n_runs").cast("double") - mu)
          / sqrt((mu - lit(1.0)) * (mu - lit(2.0))
            / (col("n_signs") - lit(1)).cast("double")))
        .as("runs_z"))
  }

  /** Cross-sectional momentum rank per day: trailing 20-bar return
    * (C_t over C_{t−20}, one division), ranked descending with key
    * tie-breaks, plus the decile bucket (1 = strongest). Only days
    * where ≥2 keys have a full lookback score. */
  private[graft] def momRank(df: DataFrame, keyCol: String, tsCol: String,
                             valCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val scored = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__b", lag(col("close"), MomW).over(w))
      .filter(col("__b").isNotNull && col("__b") > 0)
      .withColumn("mom",
        col("close").cast("double") / col("__b").cast("double"))
    val dayW = Window.partitionBy(col("day"))
      .orderBy(col("mom").desc, col(keyCol).asc)
    scored
      .withColumn("__nk", count(lit(1)).over(Window.partitionBy(col("day"))))
      .filter(col("__nk") >= 2)
      .withColumn("mom_rank", row_number().over(dayW).cast("long"))
      .select(col("day"), col(keyCol), col("close").as("close_cents"),
        col("mom"), col("mom_rank"),
        (((col("mom_rank") - 1) * 10 / col("__nk")) + 1).cast("long")
          .as("decile"))
  }

  val defs: Map[String, Q] = Map(
    // Wald–Wolfowitz runs test on up/down day signs.
    "q_runs_test" -> ((s, dir) =>
      runsTest(Tables.events(s, dir), "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc)),

    // Cross-sectional trailing-return momentum ranks + deciles.
    "q_mom_rank" -> ((s, dir) =>
      momRank(Tables.events(s, dir), "user_id", "ts", "value", "event_id")
        .orderBy(col("day").asc, col("mom_rank").asc)))

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
    "q_runs_test" ->
      s"""WITH $barsSql,
         |d AS (
         |  SELECT user_id, day,
         |    close - lag(close) OVER (PARTITION BY user_id ORDER BY day) AS x
         |  FROM bars),
         |sg AS (
         |  SELECT user_id, day,
         |    CASE WHEN x > 0 THEN 1 ELSE -1 END AS s
         |  FROM d WHERE x IS NOT NULL AND x <> 0),
         |ps AS (
         |  SELECT user_id, s,
         |    lag(s) OVER (PARTITION BY user_id ORDER BY day) AS p
         |  FROM sg),
         |g AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_signs,
         |    CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         |    CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
         |    CAST(sum(CASE WHEN p IS NULL OR s <> p THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_runs
         |  FROM ps GROUP BY user_id)
         |SELECT user_id, n_signs, n_up, n_down, n_runs,
         |  CASE WHEN n_up > 0 AND n_down > 0 AND n_signs >= 3 THEN
         |    (CAST(n_runs AS DOUBLE)
         |      - (2.0 * CAST(n_up * n_down AS DOUBLE)
         |          / CAST(n_signs AS DOUBLE) + 1.0))
         |    / sqrt(((2.0 * CAST(n_up * n_down AS DOUBLE)
         |          / CAST(n_signs AS DOUBLE) + 1.0) - 1.0)
         |        * ((2.0 * CAST(n_up * n_down AS DOUBLE)
         |          / CAST(n_signs AS DOUBLE) + 1.0) - 2.0)
         |        / CAST(n_signs - 1 AS DOUBLE))
         |  END AS runs_z
         |FROM g ORDER BY user_id""".stripMargin,

    "q_mom_rank" ->
      s"""WITH $barsSql,
         |d AS (
         |  SELECT user_id, day, close,
         |    lag(close, $MomW) OVER (PARTITION BY user_id ORDER BY day) AS b
         |  FROM bars),
         |sc AS (
         |  SELECT user_id, day, close,
         |    CAST(close AS DOUBLE) / CAST(b AS DOUBLE) AS mom
         |  FROM d WHERE b IS NOT NULL AND b > 0),
         |f AS (
         |  SELECT day, user_id, close, mom,
         |    CAST(count(*) OVER (PARTITION BY day) AS BIGINT) AS nk,
         |    CAST(row_number() OVER (PARTITION BY day
         |      ORDER BY mom DESC, user_id) AS BIGINT) AS mom_rank
         |  FROM sc)
         |SELECT day, user_id, close AS close_cents, mom, mom_rank,
         |  (mom_rank - 1) * 10 // nk + 1 AS decile
         |FROM f WHERE nk >= 2 ORDER BY day, mom_rank""".stripMargin)
}
