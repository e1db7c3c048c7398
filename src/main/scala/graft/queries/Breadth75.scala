package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventy-sixth wave — trend strength, volatility regimes, sign
  * randomness.
  *
  *  - **q_trend_r2**: OLS of close on the bar index per key — the
  *    slope (cents/bar) and R² of the linear trend. The regressor is
  *    the ROW NUMBER (1..n, gap-free even across missing calendar
  *    days), so every moment is an exact integer sum; slope and R²
  *    are emitted in pinned IEEE order (R² = num²/(vx·vy) — all three
  *    factors < 2^53 at calendar-bounded n, see the header maths in
  *    dailySharpe). The q_theil_sen robust slope's parametric twin.
  *  - **q_vol_regime**: per-day volatility regime flag — the 5-bar
  *    move-energy mean vs the key's full-sample mean, compared by
  *    integer CROSS-MULTIPLICATION (Σ_w x²·n > Σ x²·w — no division
  *    enters the verdict), plus the ratio for display. Warm-up days
  *    unflagged.
  *  - **q_sign_entropy**: Shannon entropy (bits) of each key's move
  *    SIGN distribution (up/down/flat) — three fixed-order terms
  *    c/n·log2(n/c), zero-count buckets contributing exactly 0;
  *    rounded to 6 dp on both engines (the q_parkinson transcendental
  *    stance). 1.585 bits = perfectly random three-way signs.
  *
  * Scale shape: all three ride the memoized day-move/bar grids — one
  * |key·days| shuffle, then per-key windows (bounded frames) and
  * map-side-combinable integer sums; nothing rescans ticks. */
object Breadth75 {

  private[graft] val RegimeW = 5

  /** OLS slope + R² of close-vs-bar-index per key. */
  private[graft] def trendR2(df: DataFrame, keyCol: String, tsCol: String,
                             valCol: String, tieBreak: String): DataFrame = {
    val ord = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val g = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__t", row_number().over(ord).cast("long"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum(col("__t")).as("__st"), sum(col("close")).as("__sy"),
        sum(col("__t") * col("close")).as("__sty"),
        sum(col("__t") * col("__t")).as("__stt"),
        sum(col("close") * col("close")).as("__syy"))
    val num = col("n_days") * col("__sty") - col("__st") * col("__sy")
    val vx = col("n_days") * col("__stt") - col("__st") * col("__st")
    val vy = col("n_days") * col("__syy") - col("__sy") * col("__sy")
    g.select(col(keyCol), col("n_days"),
      when(vx > 0, num.cast("double") / vx.cast("double"))
        .as("slope_cents_per_bar"),
      when(vx > 0 && vy > 0,
        num.cast("double") * num.cast("double") /
          (vx.cast("double") * vy.cast("double"))).as("r2"))
      .orderBy(col(keyCol).asc)
  }

  /** 5-bar move-energy regime vs the key's full sample (integer
    * cross-multiplied verdict + display ratio). */
  private[graft] def volRegime(df: DataFrame, keyCol: String, tsCol: String,
                               valCol: String, tieBreak: String,
                               w: Int = RegimeW): DataFrame = {
    val ord = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val win = ord.rowsBetween(-(w - 1), Window.currentRow)
    val all = Window.partitionBy(col(keyCol))
    val moves = Breadth67.dayMoves(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__xx", col("__x") * col("__x"))
      .withColumn("__sw", sum(col("__xx")).over(win))
      .withColumn("__nw", count(lit(1)).over(win))
      .withColumn("__st", sum(col("__xx")).over(all))
      .withColumn("__n", count(lit(1)).over(all))
    moves.select(col(keyCol), col("day"),
      when(col("__nw") === w && col("__st") > 0,
        col("__sw") * col("__n") > col("__st") * lit(w.toLong))
        .as("vol_regime_high"),
      when(col("__nw") === w && col("__st") > 0,
        (col("__sw").cast("double") / lit(w.toDouble)) /
          (col("__st").cast("double") / col("__n").cast("double")))
        .as("energy_ratio"))
      .orderBy(col(keyCol).asc, col("day").asc)
  }

  /** Shannon entropy of the up/down/flat sign distribution per key. */
  private[graft] def signEntropy(df: DataFrame, keyCol: String,
                                 tsCol: String, valCol: String,
                                 tieBreak: String): DataFrame = {
    val g = Breadth67.dayMoves(df, keyCol, tsCol, valCol, tieBreak)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("__x") > 0, lit(1L)).otherwise(lit(0L))).as("n_up"),
        sum(when(col("__x") < 0, lit(1L)).otherwise(lit(0L))).as("n_down"),
        sum(when(col("__x") === 0, lit(1L)).otherwise(lit(0L)))
          .as("n_flat"))
    val nD = col("n_days").cast("double")
    def term(c: org.apache.spark.sql.Column) =
      when(c > 0, c.cast("double") / nD * log2(nD / c.cast("double")))
        .otherwise(lit(0.0))
    g.select(col(keyCol), col("n_days"), col("n_up"), col("n_down"),
      col("n_flat"),
      round(term(col("n_up")) + term(col("n_down")) + term(col("n_flat")),
        6).as("sign_entropy_bits"))
      .orderBy(col(keyCol).asc)
  }

  val defs: Map[String, Q] = Map(
    "q_trend_r2" -> ((s, dir) =>
      trendR2(Tables.events(s, dir), "user_id", "ts", "value", "event_id")),
    "q_vol_regime" -> ((s, dir) =>
      volRegime(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_sign_entropy" -> ((s, dir) =>
      signEntropy(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")))

  val oracle: Map[String, String] = Map(
    "q_trend_r2" ->
      s"""WITH ${Breadth67.movesSql},
         |nb AS (
         |  SELECT user_id, close,
         |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
         |      AS BIGINT) AS t
         |  FROM bars),
         |g AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(t) AS BIGINT) AS st, CAST(sum(close) AS BIGINT) AS sy,
         |    CAST(sum(t * close) AS BIGINT) AS sty,
         |    CAST(sum(t * t) AS BIGINT) AS stt,
         |    CAST(sum(close * close) AS BIGINT) AS syy
         |  FROM nb GROUP BY 1)
         |SELECT user_id, n AS n_days,
         |  CASE WHEN n * stt - st * st > 0
         |    THEN CAST(n * sty - st * sy AS DOUBLE)
         |      / CAST(n * stt - st * st AS DOUBLE) END
         |    AS slope_cents_per_bar,
         |  CASE WHEN n * stt - st * st > 0 AND n * syy - sy * sy > 0
         |    THEN CAST(n * sty - st * sy AS DOUBLE)
         |      * CAST(n * sty - st * sy AS DOUBLE)
         |      / (CAST(n * stt - st * st AS DOUBLE)
         |        * CAST(n * syy - sy * sy AS DOUBLE)) END AS r2
         |FROM g ORDER BY user_id""".stripMargin,

    "q_vol_regime" ->
      s"""WITH ${Breadth67.movesSql},
         |e AS (
         |  SELECT user_id, day, x * x AS xx FROM mv),
         |r AS (
         |  SELECT user_id, day,
         |    CAST(sum(xx) OVER ww AS BIGINT) AS sw,
         |    CAST(count(*) OVER ww AS BIGINT) AS nw,
         |    CAST(sum(xx) OVER wa AS BIGINT) AS st,
         |    CAST(count(*) OVER wa AS BIGINT) AS n
         |  FROM e
         |  WINDOW ww AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN ${RegimeW - 1} PRECEDING AND CURRENT ROW),
         |  wa AS (PARTITION BY user_id))
         |SELECT user_id, day,
         |  CASE WHEN nw = $RegimeW AND st > 0
         |    THEN sw * n > st * $RegimeW END AS vol_regime_high,
         |  CASE WHEN nw = $RegimeW AND st > 0
         |    THEN (CAST(sw AS DOUBLE) / ${RegimeW}.0)
         |      / (CAST(st AS DOUBLE) / CAST(n AS DOUBLE)) END
         |    AS energy_ratio
         |FROM r ORDER BY user_id, day""".stripMargin,

    "q_sign_entropy" ->
      s"""WITH ${Breadth67.movesSql},
         |g AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nu,
         |    CAST(sum(CASE WHEN x < 0 THEN 1 ELSE 0 END) AS BIGINT) AS nd,
         |    CAST(sum(CASE WHEN x = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nf
         |  FROM mv GROUP BY 1)
         |SELECT user_id, n AS n_days, nu AS n_up, nd AS n_down,
         |  nf AS n_flat,
         |  round(
         |    (CASE WHEN nu > 0 THEN CAST(nu AS DOUBLE) / CAST(n AS DOUBLE)
         |      * log2(CAST(n AS DOUBLE) / CAST(nu AS DOUBLE))
         |      ELSE 0.0 END)
         |    + (CASE WHEN nd > 0 THEN CAST(nd AS DOUBLE) / CAST(n AS DOUBLE)
         |      * log2(CAST(n AS DOUBLE) / CAST(nd AS DOUBLE))
         |      ELSE 0.0 END)
         |    + (CASE WHEN nf > 0 THEN CAST(nf AS DOUBLE) / CAST(n AS DOUBLE)
         |      * log2(CAST(n AS DOUBLE) / CAST(nf AS DOUBLE))
         |      ELSE 0.0 END), 6) AS sign_entropy_bits
         |FROM g ORDER BY user_id""".stripMargin)
}
