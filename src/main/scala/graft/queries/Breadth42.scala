package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forty-second wave — lead–lag structure between series:
  *
  *  - **q_lead_lag**: for each top-key pair and each calendar lag
  *    L ∈ [−2, 2], the Pearson cross-correlation between a's day move
  *    at d and b's at d+L, plus the best-lag flag per pair — "does a
  *    lead b" as a query. Rides the q_pair_corr scale pattern: the
  *    pair space prunes to the top-N most-active keys via a broadcast
  *    semi-join (all-pairs-all-keys melts at 10⁶ keys; top-N² × 5
  *    lags stays constant), moments are integer sums, one division +
  *    two sqrts per (pair, lag).
  *
  * Determinism: moves are integer cent diffs over present days; the
  * lag shift is calendar DATE arithmetic; the best-lag pick orders by
  * (xcorr DESC NULLS LAST, lag ASC) — xcorr doubles are computed
  * identically on both engines, so the rank is stable. */
object Breadth42 {

  private[graft] val LlLags = 2 // lags −2..2
  private[graft] val LlTopKeys = 10
  private[graft] val LlMinDays = 5

  /** Lead–lag cross-correlations over the pruned pair space. */
  private[graft] def leadLag(df: DataFrame, keyCol: String, tsCol: String,
                             valCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val allBars = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .select(col(keyCol), col("day"), col("close"))
    val top = allBars.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__nd"))
      .orderBy(col("__nd").desc, col(keyCol).asc)
      .limit(LlTopKeys)
      .select(col(keyCol))
    val diffs = allBars.join(broadcast(top), Seq(keyCol), "left_semi")
      .withColumn("__x", col("close") - lag(col("close"), 1).over(w))
      .filter(col("__x").isNotNull)
    val a = diffs.select(col(keyCol).as("key_a"), col("day"),
      col("__x").as("x"))
    val b = diffs.select(col(keyCol).as("key_b"), col("day").as("day_b"),
      col("__x").as("y"))
    val lags = df.sparkSession.range(-LlLags, LlLags + 1)
      .select(col("id").as("lag"))
    val joined = a.crossJoin(broadcast(lags))
      .join(b, col("day_b") === date_add(col("day"), col("lag").cast("int"))
        && col("key_a") < col("key_b"))
    val g = joined.groupBy(col("key_a"), col("key_b"), col("lag"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
        sum(col("x") * col("x")).as("__sxx"),
        sum(col("y") * col("y")).as("__syy"),
        sum(col("x") * col("y")).as("__sxy"))
    val num = col("n_days") * col("__sxy") - col("__sx") * col("__sy")
    val vx = col("n_days") * col("__sxx") - col("__sx") * col("__sx")
    val vy = col("n_days") * col("__syy") - col("__sy") * col("__sy")
    val scored = g.withColumn("xcorr",
      when(col("n_days") >= LlMinDays && vx > 0 && vy > 0,
        num.cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double")))))
    val best = Window.partitionBy(col("key_a"), col("key_b"))
      .orderBy(col("xcorr").desc_nulls_last, col("lag").asc)
    scored.withColumn("__rn", row_number().over(best))
      .select(col("key_a"), col("key_b"), col("lag"), col("n_days"),
        col("xcorr"),
        (col("__rn") === 1 && col("xcorr").isNotNull).as("is_best"))
  }

  val defs: Map[String, Q] = Map(
    // Lead–lag cross-correlation panel over the top-key pairs.
    "q_lead_lag" -> ((s, dir) =>
      leadLag(Tables.events(s, dir), "user_id", "ts", "value", "event_id")
        .orderBy(col("key_a").asc, col("key_b").asc, col("lag").asc)))

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
    "q_lead_lag" ->
      s"""WITH $barsSql,
         |top AS (
         |  SELECT user_id FROM (
         |    SELECT user_id, count(*) AS nd FROM bars GROUP BY user_id
         |    ORDER BY nd DESC, user_id LIMIT $LlTopKeys)),
         |d AS (
         |  SELECT b.user_id, b.day,
         |    b.close - lag(b.close) OVER (PARTITION BY b.user_id ORDER BY b.day)
         |      AS x
         |  FROM bars b JOIN top USING (user_id)),
         |dd AS (SELECT user_id, day, x FROM d WHERE x IS NOT NULL),
         |lg AS (SELECT unnest(range(-$LlLags, ${LlLags + 1})) AS lag),
         |j AS (
         |  SELECT a.user_id AS key_a, b.user_id AS key_b, lg.lag,
         |    a.x AS x, b.x AS y
         |  FROM dd a CROSS JOIN lg
         |  JOIN dd b ON b.day = a.day + CAST(lg.lag AS INTEGER)
         |    AND a.user_id < b.user_id),
         |g AS (
         |  SELECT key_a, key_b, lag, CAST(count(*) AS BIGINT) AS n_days,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy
         |  FROM j GROUP BY key_a, key_b, lag),
         |sc AS (
         |  SELECT key_a, key_b, lag, n_days,
         |    CASE WHEN n_days >= $LlMinDays
         |        AND n_days * sxx - sx * sx > 0
         |        AND n_days * syy - sy * sy > 0
         |      THEN CAST(n_days * sxy - sx * sy AS DOUBLE)
         |        / (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
         |          * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE)))
         |    END AS xcorr
         |  FROM g),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY key_a, key_b
         |    ORDER BY xcorr DESC NULLS LAST, lag) AS rn
         |  FROM sc)
         |SELECT key_a, key_b, lag, n_days, xcorr,
         |  rn = 1 AND xcorr IS NOT NULL AS is_best
         |FROM r ORDER BY key_a, key_b, lag""".stripMargin)
}
