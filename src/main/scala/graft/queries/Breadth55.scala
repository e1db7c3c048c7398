package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifty-sixth wave — portfolio cross-sections: the equal-weight index
  * and value-weight turnover.
  *
  *  - **q_index_nav**: the equal-weight index NAV per day — mean close
  *    across the keys trading that day (one BIGINT sum / count
  *    division) — and the day-over-day index return stated as the
  *    cross-multiplied integer ratio (Sₜ·nₜ₋₁)/(Sₜ₋₁·nₜ) − 1, so the
  *    membership change between days is handled exactly, no float
  *    accumulation anywhere. The return lag runs on the AGGREGATED
  *    day table (calendar-bounded rows — the q_ks_drift
  *    aggregate-fed single-partition precedent, fine at any scale).
  *  - **q_turnover**: value-weight portfolio turnover between
  *    consecutive calendar days over the common universe —
  *    ½ Σ|wᵢ,ₜ − wᵢ,ₜ₋₁| stated EXACTLY as
  *    Σ|cᵢ,ₜ·Sₜ₋₁ − cᵢ,ₜ₋₁·Sₜ| / (2·Sₜ·Sₜ₋₁) with the totals taken
  *    over the matched keys (the tokenSkew cross-multiplication move:
  *    integer numerator, ONE terminal division — a float Σ|wᵢ−wᵢ'|
  *    would be order-dependent). The day pairing is calendar
  *    arithmetic (day = prev + 1), never a global row window.
  *
  * Scale shape: groupBy(day) aggregates (distributed by day), one
  * self-join on (key, day+1); int64 headroom: c·S ≲ 10⁴·10⁸ = 10¹²
  * per term at 10⁶-key portfolios. */
object Breadth55 {

  private[graft] def indexNav(df: DataFrame, keyCol: String, tsCol: String,
                              valCol: String, tieBreak: String): DataFrame = {
    val byDayOrd = Window.orderBy(col("day").asc)
    val daily = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_keys"), sum(col("close")).as("__s"))
    daily
      .withColumn("__ps", lag(col("__s"), 1).over(byDayOrd))
      .withColumn("__pn", lag(col("n_keys"), 1).over(byDayOrd))
      .select(col("day"), col("n_keys"),
        (col("__s").cast("double") /
          (col("n_keys") * lit(100L)).cast("double")).as("nav"),
        when(col("__ps").isNotNull,
          (col("__s") * col("__pn")).cast("double") /
            (col("__ps") * col("n_keys")).cast("double") - lit(1.0))
          .as("index_ret"))
      .orderBy(col("day").asc)
  }

  private[graft] def turnover(df: DataFrame, keyCol: String, tsCol: String,
                              valCol: String, tieBreak: String): DataFrame = {
    val grid = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
    val cur = grid.select(col(keyCol).as("__ka"), col("day"), col("close"))
    val prev = grid.select(col(keyCol).as("__kb"), col("day").as("__pd"),
      col("close").as("__pc"))
    val matched = cur.join(prev,
      col("__ka") === col("__kb") && col("day") === date_add(col("__pd"), 1))
      .select(col("__ka").as(keyCol), col("day"), col("close"), col("__pc"))
    val totals = matched.groupBy(col("day"))
      .agg(count(lit(1)).as("n_common"),
        sum(col("close")).as("__st"), sum(col("__pc")).as("__sp"))
    matched.join(totals, Seq("day"))
      .groupBy(col("day"), col("n_common"), col("__st"), col("__sp"))
      .agg(sum(abs(col("close") * col("__sp") - col("__pc") * col("__st")))
        .as("__num"))
      .select(col("day"), col("n_common"),
        (col("__num").cast("double") /
          (lit(2L) * col("__st") * col("__sp")).cast("double"))
          .as("turnover"))
      .orderBy(col("day").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_index_nav" -> ((s, dir) =>
      indexNav(Tables.events(s, dir), "user_id", "ts", "value", "event_id")),
    "q_turnover" -> ((s, dir) =>
      turnover(Tables.events(s, dir), "user_id", "ts", "value", "event_id")))

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
    "q_index_nav" ->
      s"""WITH $barsSql,
         |daily AS (
         |  SELECT day, CAST(count(*) AS BIGINT) AS n_keys,
         |    CAST(sum(close) AS BIGINT) AS s
         |  FROM bars GROUP BY day),
         |lg AS (
         |  SELECT day, n_keys, s,
         |    lag(s) OVER (ORDER BY day) AS ps,
         |    lag(n_keys) OVER (ORDER BY day) AS pn
         |  FROM daily)
         |SELECT day, n_keys,
         |  CAST(s AS DOUBLE) / CAST(n_keys * 100 AS DOUBLE) AS nav,
         |  CASE WHEN ps IS NOT NULL THEN
         |    CAST(s * pn AS DOUBLE) / CAST(ps * n_keys AS DOUBLE) - 1.0
         |  END AS index_ret
         |FROM lg ORDER BY day""".stripMargin,

    "q_turnover" ->
      s"""WITH $barsSql,
         |m AS (
         |  SELECT b.user_id, b.day, b.close, p.close AS pc
         |  FROM bars b JOIN bars p
         |    ON p.user_id = b.user_id AND b.day = p.day + 1),
         |tot AS (
         |  SELECT day, CAST(count(*) AS BIGINT) AS n_common,
         |    CAST(sum(close) AS BIGINT) AS st, CAST(sum(pc) AS BIGINT) AS sp
         |  FROM m GROUP BY day),
         |nm AS (
         |  SELECT m.day, t.n_common, t.st, t.sp,
         |    CAST(sum(abs(m.close * t.sp - m.pc * t.st)) AS BIGINT) AS num
         |  FROM m JOIN tot t USING (day)
         |  GROUP BY m.day, t.n_common, t.st, t.sp)
         |SELECT day, n_common,
         |  CAST(num AS DOUBLE) / CAST(2 * st * sp AS DOUBLE) AS turnover
         |FROM nm ORDER BY day""".stripMargin)
}
