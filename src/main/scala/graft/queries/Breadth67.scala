package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixty-eighth wave — relative performance, correlograms, weighted
  * sampling.
  *
  *  - **q_info_ratio**: information ratio per key against the CROSS-
  *    SECTIONAL benchmark — each day's benchmark is the lower median
  *    of all keys' cent moves that day (an exact integer, fully
  *    tie-broken — no float index to drift), excess e = x − med, and
  *    IR collapses to Σe / √(n·Σe² − (Σe)²) exactly like
  *    q_sharpe's one-division discipline (Breadth20.dailySharpe).
  *  - **q_acf**: the correlogram — per key, Pearson correlation of
  *    (move_t, move_{t−l}) pairs at lags 1..5 over day-bar cent
  *    moves. Five integer sums per (key, lag), two IEEE sqrts and one
  *    division at emit; degenerate radicands (constant series) are
  *    unscored. The multi-lag generalization of q_autocorr.
  *  - **q_weighted_sample**: Efraimidis-Spirakis weighted reservoir —
  *    top-3 docs per source by u^(1/w), w = n_chars, u a 60-bit
  *    md5-derived uniform (the q_hash_sample RNG-free discipline);
  *    ordered by the monotone-equivalent ln(u)/w so no pow enters the
  *    sort key. Deterministic per corpus; the emitted columns are the
  *    selection, never the float key.
  *
  * Scale shape: info_ratio/acf are one bar-grid shuffle plus per-key
  * windows and a |keys|-row aggregate (the day-median table is
  * |days|-bounded and broadcast); weighted_sample is map-only scoring
  * + a per-source top-k (WindowGroupLimit prunes to k per partition
  * before the shuffle). */
object Breadth67 {

  private[graft] val AcfMaxLag = 5
  private[graft] val WsK = 3
  private[graft] val WsSeed = "ws"
  private[graft] val TwoPow60 = 1152921504606846976L

  /** Per-key day-move table (key, day, x) over the memoized cent
    * bars — the shared input of q_info_ratio and q_acf. */
  private[graft] def dayMoves(df: DataFrame, keyCol: String, tsCol: String,
                              valCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .select(col(keyCol), col("day"), col("close"))
      .withColumn("__x", col("close") - lag(col("close"), 1).over(w))
      .filter(col("__x").isNotNull)
  }

  /** IR per key vs the daily cross-sectional lower-median move. */
  private[graft] def infoRatio(df: DataFrame, keyCol: String, tsCol: String,
                               valCol: String, tieBreak: String): DataFrame = {
    val moves = dayMoves(df, keyCol, tsCol, valCol, tieBreak)
    val byDay = Window.partitionBy(col("day"))
    val ordDay = Window.partitionBy(col("day"))
      .orderBy(col("__x").asc, col(keyCol).asc)
    val med = moves
      .withColumn("__rn", row_number().over(ordDay))
      .withColumn("__cnt", count(lit(1)).over(byDay))
      .withColumn("__med",
        max(when(col("__rn") === expr("(__cnt + 1) div 2"), col("__x")))
          .over(byDay))
      .withColumn("__e", col("__x") - col("__med"))
    val g = med.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum(col("__e")).as("__se"),
        sum(col("__e") * col("__e")).as("__see"))
    val varNum = col("n_days") * col("__see") - col("__se") * col("__se")
    g.select(col(keyCol), col("n_days"),
      when(varNum > 0,
        col("__se").cast("double") / sqrt(varNum.cast("double")))
        .as("info_ratio"))
      .orderBy(col(keyCol).asc)
  }

  /** Pair-Pearson correlogram at lags 1..maxLag per key. */
  private[graft] def acf(df: DataFrame, keyCol: String, tsCol: String,
                         valCol: String, tieBreak: String,
                         maxLag: Int = AcfMaxLag): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val lagged = (1 to maxLag).foldLeft(
      dayMoves(df, keyCol, tsCol, valCol, tieBreak)) { (d, l) =>
      d.withColumn(s"__y$l", lag(col("__x"), l).over(w))
    }
    val stacked = lagged.select(col(keyCol), col("__x"),
      expr((1 to maxLag).map(l => s"$l, __y$l")
        .mkString(s"stack($maxLag, ", ", ", ") as (lag, __y)")))
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
        .as("acf"))
      .orderBy(col(keyCol).asc, col("lag").asc)
  }

  /** Efraimidis-Spirakis top-k per stratum, weight = `wCol` (> 0). */
  private[graft] def weightedSample(df: DataFrame, stratCol: String,
                                    idCol: String, wCol: String,
                                    k: Int): DataFrame = {
    val h = conv(substring(md5(concat_ws("#", col(idCol).cast("string"),
      lit(WsSeed))), 1, 15), 16, 10).cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(TwoPow60).cast("double")
    val key = log(u) / col(wCol).cast("double")
    val ord = Window.partitionBy(col(stratCol))
      .orderBy(col("__key").desc, col(idCol).asc)
    df.filter(col(wCol) > 0)
      .withColumn("__key", key)
      .withColumn("sample_rank", row_number().over(ord))
      .filter(col("sample_rank") <= k)
      .select(col(stratCol), col("sample_rank").cast("int").as("sample_rank"),
        col(idCol), col(wCol))
      .orderBy(col(stratCol).asc, col("sample_rank").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_info_ratio" -> ((s, dir) =>
      infoRatio(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_acf" -> ((s, dir) =>
      acf(Tables.events(s, dir), "user_id", "ts", "value", "event_id")),
    "q_weighted_sample" -> ((s, dir) =>
      weightedSample(Tables.documents(s, dir), "source", "doc_id",
        "n_chars", WsK)))

  /** Shared day-move oracle prefix (the Breadth19/20 bar discipline). */
  private[queries] val movesSql =
    """t AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id
      |  FROM events),
      |bars AS (
      |  SELECT user_id, day, max(cl) AS close
      |  FROM (
      |    SELECT user_id, day,
      |      last_value(c) OVER (PARTITION BY user_id, day
      |        ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |        AS cl
      |    FROM t)
      |  GROUP BY user_id, day),
      |mv AS (
      |  SELECT user_id, day, x FROM (
      |    SELECT user_id, day,
      |      close - lag(close) OVER (PARTITION BY user_id ORDER BY day)
      |        AS x
      |    FROM bars)
      |  WHERE x IS NOT NULL)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_info_ratio" ->
      s"""WITH $movesSql,
         |md AS (
         |  SELECT user_id, x,
         |    max(CASE WHEN rn = (cnt + 1) // 2 THEN x END)
         |      OVER (PARTITION BY day) AS med
         |  FROM (
         |    SELECT user_id, day, x,
         |      row_number() OVER (PARTITION BY day ORDER BY x, user_id)
         |        AS rn,
         |      count(*) OVER (PARTITION BY day) AS cnt
         |    FROM mv)),
         |g AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
         |    CAST(sum(x - med) AS BIGINT) AS se,
         |    CAST(sum((x - med) * (x - med)) AS BIGINT) AS see
         |  FROM md GROUP BY 1)
         |SELECT user_id, n_days,
         |  CASE WHEN n_days * see - se * se > 0
         |    THEN CAST(se AS DOUBLE)
         |      / sqrt(CAST(n_days * see - se * se AS DOUBLE))
         |  END AS info_ratio
         |FROM g ORDER BY user_id""".stripMargin,

    "q_acf" -> {
      val lags = (1 to AcfMaxLag).map(l =>
        s"""  SELECT user_id, $l AS lag, x,
           |    lag(x, $l) OVER (PARTITION BY user_id ORDER BY day) AS y
           |  FROM mv""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH $movesSql,
         |st AS (
         |SELECT * FROM (
         |$lags
         |) WHERE y IS NOT NULL),
         |g AS (
         |  SELECT user_id, lag, CAST(count(*) AS BIGINT) AS m,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM st GROUP BY 1, 2)
         |SELECT user_id, lag, m AS n_pairs,
         |  CASE WHEN m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0
         |    THEN CAST(m * sxy - sx * sy AS DOUBLE)
         |      / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
         |        * sqrt(CAST(m * syy - sy * sy AS DOUBLE)))
         |  END AS acf
         |FROM g ORDER BY user_id, lag""".stripMargin
    },

    "q_weighted_sample" ->
      s"""SELECT source, sample_rank, doc_id, n_chars FROM (
         |  SELECT source, doc_id, n_chars,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY ln((CAST(('0x' || substr(md5(
         |          CAST(doc_id AS VARCHAR) || '#$WsSeed'), 1, 15))::BIGINT
         |          AS DOUBLE) + 0.5)
         |        / CAST($TwoPow60 AS DOUBLE))
         |        / CAST(n_chars AS DOUBLE) DESC,
         |      doc_id) AS INTEGER) AS sample_rank
         |  FROM documents WHERE n_chars > 0)
         |WHERE sample_rank <= $WsK
         |ORDER BY source, sample_rank""".stripMargin)
}
