package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventy-fourth wave — position sizing, market capture, drawdown
  * pain.
  *
  *  - **q_kelly**: two Kelly fractions per key from day moves. The
  *    mean-variance form collapses to ONE integer ratio
  *    n·Σx / (n·Σx² − (Σx)²); the win/loss form algebraically reduces
  *    to n_w·(Σwin − Σloss) / (n₂·Σwin) — also one exact division
  *    (n₂ = wins + losses; zero-move days sit out, a one-sided key is
  *    unscored).
  *  - **q_capture_ratio**: up/down market capture — Σ key move over
  *    Σ market move restricted to market-up (market-down) days, the
  *    aggregate-ratio form (NEVER a mean of per-day quotients — the
  *    float-sum trap), plus their ratio. Market = the q_beta Σ-of-
  *    moves factor.
  *  - **q_pain_index**: the L1 drawdown companion of q_ulcer — mean
  *    distance below the running peak in integer cents (Σ(peak −
  *    close)/n, one division) plus the max drawdown.
  *
  * Scale shape: all three ride the memoized |key·days| grids —
  * kelly/pain are per-key windows + map-side-combinable integer sums;
  * capture joins the |days|-bounded market table broadcast-size. */
object Breadth73 {

  /** Mean-variance and win/loss Kelly fractions per key. */
  private[graft] def kelly(df: DataFrame, keyCol: String, tsCol: String,
                           valCol: String, tieBreak: String): DataFrame = {
    val g = Breadth67.dayMoves(df, keyCol, tsCol, valCol, tieBreak)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(when(col("__x") > 0, lit(1L)).otherwise(lit(0L))).as("__nw"),
        sum(when(col("__x") < 0, lit(1L)).otherwise(lit(0L))).as("__nl"),
        sum(when(col("__x") > 0, col("__x")).otherwise(lit(0L)))
          .as("__sw"),
        sum(when(col("__x") < 0, -col("__x")).otherwise(lit(0L)))
          .as("__sl"))
    val varNum = col("n_days") * col("__sxx") - col("__sx") * col("__sx")
    val n2 = col("__nw") + col("__nl")
    g.select(col(keyCol), col("n_days"),
      when(varNum > 0,
        (col("n_days") * col("__sx")).cast("double") /
          varNum.cast("double")).as("kelly_mv"),
      when(col("__nw") > 0 && col("__nl") > 0,
        (col("__nw") * (col("__sw") - col("__sl"))).cast("double") /
          (n2 * col("__sw")).cast("double")).as("kelly_win"))
      .orderBy(col(keyCol).asc)
  }

  /** Up/down market capture per key (aggregate-ratio form). */
  private[graft] def captureRatio(df: DataFrame, keyCol: String,
                                  tsCol: String, valCol: String,
                                  tieBreak: String): DataFrame = {
    val g = Breadth72.movesWithMarket(df, keyCol, tsCol, valCol, tieBreak)
      .groupBy(col(keyCol))
      .agg(sum(when(col("__m") > 0, lit(1L)).otherwise(lit(0L)))
          .as("n_up"),
        sum(when(col("__m") < 0, lit(1L)).otherwise(lit(0L)))
          .as("n_down"),
        sum(when(col("__m") > 0, col("__x")).otherwise(lit(0L)))
          .as("__xu"),
        sum(when(col("__m") > 0, col("__m")).otherwise(lit(0L)))
          .as("__mu"),
        sum(when(col("__m") < 0, col("__x")).otherwise(lit(0L)))
          .as("__xd"),
        sum(when(col("__m") < 0, col("__m")).otherwise(lit(0L)))
          .as("__md"))
    val up = col("__xu").cast("double") / col("__mu").cast("double")
    val dn = col("__xd").cast("double") / col("__md").cast("double")
    g.select(col(keyCol), col("n_up"), col("n_down"),
      when(col("__mu") > 0, up).as("up_capture"),
      when(col("__md") < 0, dn).as("down_capture"),
      when(col("__mu") > 0 && col("__md") < 0 && col("__xd") =!= 0,
        up / dn).as("capture_ratio"))
      .orderBy(col(keyCol).asc)
  }

  /** Mean + max distance below the running close peak, integer cents. */
  private[graft] def painIndex(df: DataFrame, keyCol: String, tsCol: String,
                               valCol: String, tieBreak: String): DataFrame = {
    val upTo = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__dd", max(col("close")).over(upTo) - col("close"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        max(col("__dd")).as("max_dd_cents"),
        sum(col("__dd")).as("__sdd"))
      .select(col(keyCol), col("n_days"), col("max_dd_cents"),
        (col("__sdd").cast("double") / col("n_days").cast("double"))
          .as("pain_index_cents"))
      .orderBy(col(keyCol).asc)
  }

  val defs: Map[String, Q] = Map(
    "q_kelly" -> ((s, dir) =>
      kelly(Tables.events(s, dir), "user_id", "ts", "value", "event_id")),
    "q_capture_ratio" -> ((s, dir) =>
      captureRatio(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_pain_index" -> ((s, dir) =>
      painIndex(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")))

  val oracle: Map[String, String] = Map(
    "q_kelly" ->
      s"""WITH ${Breadth67.movesSql},
         |g AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nw,
         |    CAST(sum(CASE WHEN x < 0 THEN 1 ELSE 0 END) AS BIGINT) AS nl,
         |    CAST(sum(CASE WHEN x > 0 THEN x ELSE 0 END) AS BIGINT) AS sw,
         |    CAST(sum(CASE WHEN x < 0 THEN -x ELSE 0 END) AS BIGINT) AS sl
         |  FROM mv GROUP BY 1)
         |SELECT user_id, n AS n_days,
         |  CASE WHEN n * sxx - sx * sx > 0
         |    THEN CAST(n * sx AS DOUBLE)
         |      / CAST(n * sxx - sx * sx AS DOUBLE) END AS kelly_mv,
         |  CASE WHEN nw > 0 AND nl > 0
         |    THEN CAST(nw * (sw - sl) AS DOUBLE)
         |      / CAST((nw + nl) * sw AS DOUBLE) END AS kelly_win
         |FROM g ORDER BY user_id""".stripMargin,

    "q_capture_ratio" ->
      s"""WITH ${Breadth67.movesSql},
         |mk AS (SELECT day, CAST(sum(x) AS BIGINT) AS m FROM mv GROUP BY 1),
         |g AS (
         |  SELECT mv.user_id,
         |    CAST(sum(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         |    CAST(sum(CASE WHEN m < 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_down,
         |    CAST(sum(CASE WHEN m > 0 THEN x ELSE 0 END) AS BIGINT) AS xu,
         |    CAST(sum(CASE WHEN m > 0 THEN m ELSE 0 END) AS BIGINT) AS mu,
         |    CAST(sum(CASE WHEN m < 0 THEN x ELSE 0 END) AS BIGINT) AS xd,
         |    CAST(sum(CASE WHEN m < 0 THEN m ELSE 0 END) AS BIGINT) AS md
         |  FROM mv JOIN mk USING (day) GROUP BY 1)
         |SELECT user_id, n_up, n_down,
         |  CASE WHEN mu > 0
         |    THEN CAST(xu AS DOUBLE) / CAST(mu AS DOUBLE) END AS up_capture,
         |  CASE WHEN md < 0
         |    THEN CAST(xd AS DOUBLE) / CAST(md AS DOUBLE) END
         |    AS down_capture,
         |  CASE WHEN mu > 0 AND md < 0 AND xd <> 0
         |    THEN (CAST(xu AS DOUBLE) / CAST(mu AS DOUBLE))
         |      / (CAST(xd AS DOUBLE) / CAST(md AS DOUBLE)) END
         |    AS capture_ratio
         |FROM g ORDER BY user_id""".stripMargin,

    "q_pain_index" ->
      s"""WITH ${Breadth67.movesSql},
         |dd AS (
         |  SELECT user_id,
         |    max(close) OVER (PARTITION BY user_id ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - close
         |      AS d
         |  FROM bars)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
         |  CAST(max(d) AS BIGINT) AS max_dd_cents,
         |  CAST(CAST(sum(d) AS BIGINT) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS pain_index_cents
         |FROM dd GROUP BY user_id ORDER BY user_id""".stripMargin)
}
