package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventy-third wave — market lead-lag, tail-index estimation, gap
  * event studies.
  *
  *  - **q_xcf**: the cross-correlation function — per key, Pearson
  *    correlation of its day move against the MARKET move (Σ of all
  *    keys' moves that day, the q_beta factor) at lags 0..3. Five
  *    integer sums per (key, lag) like q_acf; lag 0 reads
  *    contemporaneous β-correlation, positive lags read whether the
  *    market LEADS the key. Degenerate radicands unscored.
  *  - **q_hill_tail**: the Hill tail-index estimator over |day move|
  *    order statistics: α = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) for the k = 10
  *    largest absolute moves above the (k+1)-th. Each log-ratio of
  *    integers quantizes to micronats (the q_theil_index discipline)
  *    so the sum is order-free; keys with fewer than k+1 positive
  *    |moves| are unscored. Small α = fat tail.
  *  - **q_gap_fill**: opening-gap event study — a gap-up day opens
  *    strictly above the prior bar's high (gap-down symmetric, sign
  *    flagged); the fill day is the FIRST later day whose low (high)
  *    touches back to the prior bar's boundary. Pure integer
  *    comparisons; the forward search is one conditional min over an
  *    unbounded-following frame on the bar grid, never a self-join.
  *
  * Scale shape: xcf joins the |days|-bounded market table back to the
  * move grid (broadcast-size) and aggregates |key·lag| rows; hill is a
  * per-key top-(k+1) rank filter then a |keys|-row aggregate; gap_fill
  * is two ordered windows over the memoized |key·days| bar grid. */
object Breadth72 {

  private[graft] val XcfMaxLag = 3
  private[graft] val HillK = 10

  /** Per-key day moves joined with the same-day market move. */
  private[graft] def movesWithMarket(df: DataFrame, keyCol: String,
                                     tsCol: String, valCol: String,
                                     tieBreak: String): DataFrame = {
    val moves = Breadth67.dayMoves(df, keyCol, tsCol, valCol, tieBreak)
    val mkt = moves.groupBy(col("day")).agg(sum(col("__x")).as("__m"))
    moves.join(mkt, Seq("day"))
  }

  /** Pearson XCF of (key move_t, market move_{t−l}) at lags 0..maxLag. */
  private[graft] def xcf(df: DataFrame, keyCol: String, tsCol: String,
                         valCol: String, tieBreak: String,
                         maxLag: Int = XcfMaxLag): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val lagged = (0 to maxLag).foldLeft(
      movesWithMarket(df, keyCol, tsCol, valCol, tieBreak)) { (d, l) =>
      d.withColumn(s"__y$l", lag(col("__m"), l).over(w))
    }
    val stacked = lagged.select(col(keyCol), col("__x"),
      expr((0 to maxLag).map(l => s"$l, __y$l")
        .mkString(s"stack(${maxLag + 1}, ", ", ", ") as (lag, __y)")))
      .filter(col("__y").isNotNull)
    val g = stacked.groupBy(col(keyCol), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    val num = col("n_pairs") * col("__sxy") - col("__sx") * col("__sy")
    val vx = col("n_pairs") * col("__sxx") - col("__sx") * col("__sx")
    val vy = col("n_pairs") * col("__syy") - col("__sy") * col("__sy")
    g.select(col(keyCol), col("lag"), col("n_pairs"),
      when(vx > 0 && vy > 0,
        num.cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
        .as("xcf"))
      .orderBy(col(keyCol).asc, col("lag").asc)
  }

  /** Hill estimator over the k largest |day moves| per key. */
  private[graft] def hillTail(df: DataFrame, keyCol: String, tsCol: String,
                              valCol: String, tieBreak: String,
                              k: Int = HillK): DataFrame = {
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(abs(col("__x")).desc, col("day").asc)
    val ranked = Breadth67.dayMoves(df, keyCol, tsCol, valCol, tieBreak)
      .filter(abs(col("__x")) > 0)
      .withColumn("__a", abs(col("__x")))
      .withColumn("__rn", row_number().over(ord))
      .filter(col("__rn") <= k + 1)
    val thr = ranked.filter(col("__rn") === k + 1)
      .select(col(keyCol), col("__a").as("__thr"))
    val terms = ranked.filter(col("__rn") <= k)
      .join(thr, Seq(keyCol))
      .withColumn("__q",
        floor(log(col("__a").cast("double") / col("__thr").cast("double")) *
          lit(1.0e6) + lit(0.5)).cast("long"))
    terms.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__nk"), sum(col("__q")).as("__sq"))
      .select(col(keyCol), lit(k).cast("int").as("k"),
        when(col("__sq") > 0,
          lit(k * 1.0e6) / col("__sq").cast("double")).as("hill_alpha"))
      .orderBy(col(keyCol).asc)
  }

  /** Opening gaps and their fill days over the day-bar grid. The fill
    * threshold is the GAP day's prior-bar boundary, so the forward
    * search is a per-key gaps×bars join (both calendar-bounded — ≤366
    * bars/key/year on each side, the Recurrence scale argument), never
    * a window whose predicate would re-evaluate the boundary per
    * future row. */
  private[graft] def gapFill(df: DataFrame, keyCol: String, tsCol: String,
                             valCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val bars = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__ph", lag(col("high"), 1).over(w))
      .withColumn("__pl", lag(col("low"), 1).over(w))
    val up = bars.filter(col("__ph").isNotNull && col("open") > col("__ph"))
      .select(col(keyCol), col("day"), lit(1).as("direction"),
        (col("open") - col("__ph")).as("gap_cents"),
        col("__ph").as("__thr"))
    val dn = bars.filter(col("__pl").isNotNull && col("open") < col("__pl"))
      .select(col(keyCol), col("day"), lit(-1).as("direction"),
        (col("__pl") - col("open")).as("gap_cents"),
        col("__pl").as("__thr"))
    val gaps = up.unionAll(dn)
    // the probe side renames every column (incl. the key) so the
    // self-join on the bar grid carries zero ambiguous attributes
    val later = bars.select(col(keyCol).as("__k2"), col("day").as("__d2"),
      col("high").as("__h2"), col("low").as("__l2"))
    val fills = gaps.join(later,
        col("__k2") === col(keyCol) && col("__d2") > col("day") &&
          ((col("direction") === 1 && col("__l2") <= col("__thr")) ||
            (col("direction") === -1 && col("__h2") >= col("__thr"))),
        "left")
      .groupBy(col(keyCol), col("day"), col("direction"), col("gap_cents"))
      .agg(min(col("__d2")).as("fill_day"))
    fills
      .select(col(keyCol), col("day"), col("direction"), col("gap_cents"),
        col("fill_day"), datediff(col("fill_day"), col("day"))
          .cast("long").as("days_to_fill"))
      .orderBy(col(keyCol).asc, col("day").asc, col("direction").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_xcf" -> ((s, dir) =>
      xcf(Tables.events(s, dir), "user_id", "ts", "value", "event_id")),
    "q_hill_tail" -> ((s, dir) =>
      hillTail(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_gap_fill" -> ((s, dir) =>
      gapFill(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")))

  /** OHLC bar prefix shared by the gap oracle. */
  private val ohlcSql =
    """t AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id
      |  FROM events),
      |bars AS (
      |  SELECT user_id, day, max(op) AS open, max(cl) AS close,
      |    max(c) AS high, min(c) AS low
      |  FROM (
      |    SELECT user_id, day, c,
      |      first_value(c) OVER wb AS op, last_value(c) OVER wb AS cl
      |    FROM t
      |    WINDOW wb AS (PARTITION BY user_id, day ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |  GROUP BY user_id, day)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_xcf" -> {
      val lags = (0 to XcfMaxLag).map(l =>
        s"""  SELECT user_id, $l AS lag, x,
           |    lag(m, $l) OVER (PARTITION BY user_id ORDER BY day) AS y
           |  FROM mm""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH ${Breadth67.movesSql},
         |mk AS (SELECT day, CAST(sum(x) AS BIGINT) AS m FROM mv GROUP BY 1),
         |mm AS (SELECT mv.user_id, mv.day, mv.x, mk.m
         |  FROM mv JOIN mk USING (day)),
         |st AS (
         |SELECT * FROM (
         |$lags
         |) WHERE y IS NOT NULL),
         |g AS (
         |  SELECT user_id, lag, CAST(count(*) AS BIGINT) AS np,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM st GROUP BY 1, 2)
         |SELECT user_id, lag, np AS n_pairs,
         |  CASE WHEN np * sxx - sx * sx > 0 AND np * syy - sy * sy > 0
         |    THEN CAST(np * sxy - sx * sy AS DOUBLE)
         |      / (sqrt(CAST(np * sxx - sx * sx AS DOUBLE))
         |        * sqrt(CAST(np * syy - sy * sy AS DOUBLE)))
         |  END AS xcf
         |FROM g ORDER BY user_id, lag""".stripMargin
    },

    "q_hill_tail" ->
      s"""WITH ${Breadth67.movesSql},
         |r AS (
         |  SELECT user_id, abs(x) AS a,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY abs(x) DESC, day) AS rn
         |  FROM mv WHERE abs(x) > 0),
         |thr AS (SELECT user_id, a AS thr FROM r WHERE rn = ${HillK + 1}),
         |term AS (
         |  SELECT r.user_id,
         |    CAST(floor(ln(CAST(r.a AS DOUBLE) / CAST(thr.thr AS DOUBLE))
         |      * 1.0e6 + 0.5) AS BIGINT) AS q
         |  FROM r JOIN thr USING (user_id) WHERE r.rn <= $HillK)
         |SELECT user_id, CAST($HillK AS INTEGER) AS k,
         |  CASE WHEN sum(q) > 0
         |    THEN ${HillK}.0e6 / CAST(sum(q) AS DOUBLE) END AS hill_alpha
         |FROM term GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_gap_fill" ->
      s"""WITH $ohlcSql,
         |nb AS (
         |  SELECT user_id, day, open, high, low,
         |    lag(high) OVER wk AS ph, lag(low) OVER wk AS pl
         |  FROM bars
         |  WINDOW wk AS (PARTITION BY user_id ORDER BY day)),
         |gaps AS (
         |  SELECT user_id, day, 1 AS direction, open - ph AS gap_cents,
         |    ph AS thr
         |  FROM nb WHERE ph IS NOT NULL AND open > ph
         |  UNION ALL
         |  SELECT user_id, day, -1, pl - open, pl
         |  FROM nb WHERE pl IS NOT NULL AND open < pl),
         |f AS (
         |  SELECT g.user_id, g.day, g.direction, g.gap_cents,
         |    min(b.day) AS fill_day
         |  FROM gaps g LEFT JOIN bars b
         |    ON b.user_id = g.user_id AND b.day > g.day
         |    AND ((g.direction = 1 AND b.low <= g.thr)
         |      OR (g.direction = -1 AND b.high >= g.thr))
         |  GROUP BY 1, 2, 3, 4)
         |SELECT user_id, day, direction, gap_cents, fill_day,
         |  CAST(date_diff('day', day, fill_day) AS BIGINT) AS days_to_fill
         |FROM f ORDER BY user_id, day, direction""".stripMargin)
}
