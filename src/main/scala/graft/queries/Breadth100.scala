package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-first wave — product-analytics depth: adoption, bounded
  * retention, engagement-duration distributions.
  *
  *  - **q_feature_adoption**: per event type, the adoption curve —
  *    first-use day per (user, type), then daily new adopters and the
  *    running cumulative count. Pure integer counts.
  *  - **q_dayn_retention**: classic day-N retention at N ∈ {1,7,14,28}
  *    — the share of users whose LAST activity is ≥ N days after their
  *    first. One per-user aggregate crossed with the broadcast horizon
  *    list; exact integer compare per horizon.
  *  - **q_session_quantiles**: exact p50/p90 of 30-min-gap session
  *    durations — the duration count table (µs int64) + ceil(p·n) rank
  *    selection, no approximate percentile anywhere.
  *  - **q_repeat_interval**: the inter-purchase cadence — per-user
  *    calendar-day gaps between consecutive purchase events, with the
  *    exact mean (one division) and the same rank-exact p50/p90.
  *
  * Scale shape: adoption collapses to the |users×types| first-use table
  * before any window; retention is one |users| aggregate; both quantile
  * queries rank over VALUE-DOMAIN count tables (|distinct durations| ≪
  * |sessions|), never a global per-row sort. */
object Breadth100 {

  private val Horizons = Seq(1, 7, 14, 28)
  private val GapSeconds = 1800L

  /** Rank-exact quantile at ceil(p_num·n/p_den) over a (v, cnt) count
    * table — returns one row (n, q50-style value) per quantile column
    * requested by the caller via conditional max. */
  private def quantileCols(vc: DataFrame): DataFrame = {
    val ord = Window.orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy()
    vc.withColumn("__pre", coalesce(sum(col("__cnt")).over(ord), lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(all))
      .withColumn("__k50", shiftright(col("__n") + 1L, 1)) // ceil(n/2)
      .withColumn("__k90",
        floor(((col("__n") * 9L + 9L).cast("double")) / lit(10.0))
          .cast("long"))
      .groupBy()
      .agg(max(col("__n")).as("__nn"),
        max(when(col("__k50") > col("__pre") &&
          col("__k50") <= col("__pre") + col("__cnt"), col("__v")))
          .as("__p50"),
        max(when(col("__k90") > col("__pre") &&
          col("__k90") <= col("__pre") + col("__cnt"), col("__v")))
          .as("__p90"))
  }

  /** Daily new + cumulative adopters per event type. */
  private[graft] def featureAdoption(df: DataFrame, keyCol: String,
                                     tsCol: String,
                                     typeCol: String): DataFrame = {
    val firstUse = df
      .select(col(typeCol), col(keyCol), col(tsCol).cast("date").as("__d"))
      .groupBy(col(typeCol), col(keyCol))
      .agg(min(col("__d")).as("__first"))
    val daily = firstUse.groupBy(col(typeCol), col("__first").as("day"))
      .agg(count(lit(1)).as("new_adopters"))
    val run = Window.partitionBy(col(typeCol)).orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum_adopters", sum(col("new_adopters")).over(run))
      .orderBy(col(typeCol).asc, col("day").asc)
  }

  /** Day-N retention at the classic horizons. */
  private[graft] def daynRetention(df: DataFrame, keyCol: String,
                                   tsCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val per = df.select(col(keyCol), col(tsCol).cast("date").as("__d"))
      .groupBy(col(keyCol))
      .agg(min(col("__d")).as("__first"), max(col("__d")).as("__last"))
    val h = Horizons.toDF("horizon_days")
    per.crossJoin(broadcast(h))
      .groupBy(col("horizon_days"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(datediff(col("__last"), col("__first")) >=
          col("horizon_days"), 1L).otherwise(0L)).as("retained"))
      .select(col("horizon_days").cast("long"), col("n_users"),
        col("retained"),
        (col("retained").cast("double") / col("n_users").cast("double"))
          .as("retention"))
      .orderBy(col("horizon_days").asc)
  }

  /** Exact p50/p90 of 30-min-gap session durations (seconds). */
  private[graft] def sessionQuantiles(df: DataFrame, keyCol: String,
                                      tsCol: String,
                                      tieBreak: String): DataFrame = {
    val seq = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val marked = df
      .select(col(keyCol), col(tsCol), col(tieBreak), us.as("__us"))
      .withColumn("__new",
        when(col("__us") - lag(col("__us"), 1).over(seq) >
          lit(GapSeconds * 1000000L), 1L).otherwise(
          when(lag(col("__us"), 1).over(seq).isNull, 1L).otherwise(0L)))
      .withColumn("__sid", sum(col("__new")).over(
        seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val durations = marked.groupBy(col(keyCol), col("__sid"))
      .agg((max(col("__us")) - min(col("__us"))).as("__dur"))
    val vc = durations.groupBy(col("__dur").as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    quantileCols(vc).select(col("__nn").as("n_sessions"),
      (col("__p50").cast("double") / lit(1.0e6)).as("p50_sec"),
      (col("__p90").cast("double") / lit(1.0e6)).as("p90_sec"))
  }

  /** Exact mean / p50 / p90 of per-user purchase-to-purchase day gaps. */
  private[graft] def repeatInterval(df: DataFrame, keyCol: String,
                                    tsCol: String, typeCol: String,
                                    typeVal: String): DataFrame = {
    val days = df.filter(col(typeCol) === typeVal)
      .select(col(keyCol), col(tsCol).cast("date").as("__d"))
      .distinct()
    val seq = Window.partitionBy(col(keyCol)).orderBy(col("__d").asc)
    val gaps = days
      .withColumn("__gap",
        datediff(col("__d"), lag(col("__d"), 1).over(seq)).cast("long"))
      .filter(col("__gap").isNotNull)
    val vc = gaps.groupBy(col("__gap").as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val stats = gaps.agg(count(lit(1)).as("__n"), sum(col("__gap")).as("__s"))
    quantileCols(vc).crossJoin(broadcast(stats))
      .select(col("__nn").as("n_gaps"),
        (col("__s").cast("double") / col("__n").cast("double"))
          .as("mean_days"),
        col("__p50").cast("double").as("p50_days"),
        col("__p90").cast("double").as("p90_days"))
  }

  val defs: Map[String, Q] = Map(
    "q_feature_adoption" -> ((s, dir) =>
      featureAdoption(Tables.events(s, dir), "user_id", "ts",
        "event_type")),
    "q_dayn_retention" -> ((s, dir) =>
      daynRetention(Tables.events(s, dir), "user_id", "ts")),
    "q_session_quantiles" -> ((s, dir) =>
      sessionQuantiles(Tables.events(s, dir), "user_id", "ts",
        "event_id")),
    "q_repeat_interval" -> ((s, dir) =>
      repeatInterval(Tables.events(s, dir), "user_id", "ts", "event_type",
        "purchase")))

  val oracle: Map[String, String] = Map(
    "q_feature_adoption" ->
      """WITH fu AS (
        |  SELECT event_type, user_id, min(CAST(ts AS DATE)) AS day
        |  FROM events GROUP BY 1, 2),
        |daily AS (
        |  SELECT event_type, day, CAST(count(*) AS BIGINT) AS new_adopters
        |  FROM fu GROUP BY 1, 2)
        |SELECT event_type, day, new_adopters,
        |  CAST(sum(new_adopters) OVER (PARTITION BY event_type
        |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_adopters
        |FROM daily ORDER BY event_type, day""".stripMargin,

    "q_dayn_retention" ->
      """WITH per AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS f,
        |    max(CAST(ts AS DATE)) AS l
        |  FROM events GROUP BY 1),
        |h AS (SELECT * FROM (VALUES (1), (7), (14), (28)) AS t(n))
        |SELECT CAST(h.n AS BIGINT) AS horizon_days,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(CASE WHEN date_diff('day', f, l) >= h.n
        |    THEN 1 ELSE 0 END) AS BIGINT) AS retained,
        |  CAST(sum(CASE WHEN date_diff('day', f, l) >= h.n
        |    THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS retention
        |FROM per CROSS JOIN h
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_session_quantiles" ->
      s"""WITH x AS (
         |  SELECT user_id, ts, event_id, epoch_us(ts) AS us,
         |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS prev_us
         |  FROM events),
         |y AS (
         |  SELECT *, CASE WHEN prev_us IS NULL THEN 1
         |    WHEN us - prev_us > ${GapSeconds * 1000000L} THEN 1
         |    ELSE 0 END AS ns FROM x),
         |z AS (
         |  SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS sid
         |  FROM y),
         |dur AS (
         |  SELECT CAST(max(us) - min(us) AS BIGINT) AS v
         |  FROM z GROUP BY user_id, sid),
         |vc AS (
         |  SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM dur GROUP BY 1),
         |rk AS (
         |  SELECT v, cnt,
         |    CAST(COALESCE(sum(cnt) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS pre,
         |    CAST(sum(cnt) OVER () AS BIGINT) AS n
         |  FROM vc)
         |SELECT CAST(max(n) AS BIGINT) AS n_sessions,
         |  CAST(max(CASE WHEN (n + 1) // 2 > pre
         |    AND (n + 1) // 2 <= pre + cnt THEN v END) AS DOUBLE)
         |    / 1000000.0 AS p50_sec,
         |  CAST(max(CASE WHEN (n * 9 + 9) // 10 > pre
         |    AND (n * 9 + 9) // 10 <= pre + cnt THEN v END) AS DOUBLE)
         |    / 1000000.0 AS p90_sec
         |FROM rk""".stripMargin,

    "q_repeat_interval" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |  FROM events WHERE event_type = 'purchase'),
        |gaps AS (
        |  SELECT CAST(date_diff('day',
        |    lag(d) OVER (PARTITION BY user_id ORDER BY d), d) AS BIGINT)
        |    AS v
        |  FROM days QUALIFY v IS NOT NULL),
        |vc AS (
        |  SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM gaps GROUP BY 1),
        |rk AS (
        |  SELECT v, cnt,
        |    CAST(COALESCE(sum(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS pre,
        |    CAST(sum(cnt) OVER () AS BIGINT) AS n
        |  FROM vc),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS s
        |  FROM gaps)
        |SELECT CAST(max(rk.n) AS BIGINT) AS n_gaps,
        |  CAST(max(st.s) AS DOUBLE) / CAST(max(st.n) AS DOUBLE)
        |    AS mean_days,
        |  CAST(max(CASE WHEN (rk.n + 1) // 2 > pre
        |    AND (rk.n + 1) // 2 <= pre + cnt THEN v END) AS DOUBLE)
        |    AS p50_days,
        |  CAST(max(CASE WHEN (rk.n * 9 + 9) // 10 > pre
        |    AND (rk.n * 9 + 9) // 10 <= pre + cnt THEN v END) AS DOUBLE)
        |    AS p90_days
        |FROM rk CROSS JOIN st""".stripMargin)
}
