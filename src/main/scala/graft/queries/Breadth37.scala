package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirty-seventh wave — volatility regime and session-boundary
  * analytics:
  *
  *  - **volatility ratio** (ATR(5)/ATR(20)): the regime detector —
  *    short over long Wilder-smoothed true range, BOTH recurrences in
  *    one fold (the q_keltner ATR discipline at two horizons), one
  *    terminal division;
  *  - **overnight gap stats** (per key): the open-vs-prior-close gap
  *    decomposition — counts of up/down gaps, the largest gap each
  *    way, and the aggregate |gap| per close cent (all integer sums,
  *    one terminal division) — the session-boundary risk report.
  *
  * Exact-parity discipline: true ranges and gaps are integer cents;
  * both ATRs seed with simple means of integer sums and then run the
  * classic (prev·(n−1) + tr)/n recurrence with identical operand
  * order in the recursive-CTE oracle; gap stats are all-integer until
  * one division.
  *
  * Scale shape: one bar-grid fold per key (O(1) state) for the
  * ratio; one lag + hash aggregate for the gap stats.
  */
object Breadth37 {

  private[graft] val VrShort = 5
  private[graft] val VrLong = 20

  /** Dual-ATR accumulator: previous close + both Wilder states (the
    * warm-up integer TR sums and the smoothed values once seeded). */
  private[graft] case class VrAcc(pc: Long, trSumS: Long, trSumL: Long,
                                  atrS: Option[Double], atrL: Option[Double])

  /** One dual-ATR step at 0-based bar index `i` (TR count = i): TR =
    * max(H−L, |H−pc|, |L−pc|) integer cents; each horizon seeds at
    * the simple mean of its first n TRs, then (prev·(n−1) + tr)/n. */
  private[graft] def vrStep(st: Option[VrAcc], c: Long, h: Long, l: Long,
                            i: Int): VrAcc = st match {
    case None => VrAcc(c, 0L, 0L, None, None)
    case Some(a) =>
      val tr = math.max(h - l, math.max(math.abs(h - a.pc),
        math.abs(l - a.pc)))
      val j = i.toLong
      def smooth(n: Int, sum: Long, prev: Option[Double])
          : (Long, Option[Double]) = {
        val s = sum + tr
        if (j < n) (s, None)
        else if (j == n) (s, Some(s.toDouble / n.toDouble))
        else (s, Some((prev.get * (n - 1).toDouble + tr.toDouble) / n.toDouble))
      }
      val (ss, as) = smooth(VrShort, a.trSumS, a.atrS)
      val (sl, al) = smooth(VrLong, a.trSumL, a.atrL)
      VrAcc(c, ss, sl, as, al)
  }

  /** ATR(5)/ATR(20) per key — the volatility regime ratio; scored
    * once both horizons are seeded and the long ATR is positive. */
  private[graft] def volRatio(df: DataFrame, keyCol: String, tsCol: String,
                              valCol: String, tieBreak: String): DataFrame = {
    val loop = graft.ops.Recurrence.foldUdfIndexed {
      (st: Option[VrAcc], b: graft.ops.Bar, i: Int) =>
        val a = vrStep(st, b.close, b.high, b.low, i)
        (a, (a.atrS, a.atrL,
          (a.atrS, a.atrL) match {
            case (Some(s), Some(l)) if l > 0.0 => Some(s / l)
            case _ => None
          }))
    }
    graft.ops.Recurrence.barArrays(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__s",
        loop.apply(graft.ops.Recurrence.foldInputs(col("__bars")): _*))
      .select(col(keyCol), explode(zip_with(col("__bars"), col("__s"),
        (b, s) => struct(b.getField("day").as("day"),
          b.getField("close").as("close_cents"),
          (s.getField("_1") / lit(100.0)).as("atr_short"),
          (s.getField("_2") / lit(100.0)).as("atr_long"),
          s.getField("_3").as("vol_ratio")))).as("r"))
      .select(col(keyCol), col("r.*"))
      .filter(col("vol_ratio").isNotNull)
  }

  /** Overnight gap stats per key: gap = open − prior close (integer
    * cents over PRESENT days); counts and extremes each way plus the
    * aggregate |gap| per prior-close cent (the gap-risk density, one
    * division). Keys need ≥2 bars. */
  private[graft] def gapStats(df: DataFrame, keyCol: String, tsCol: String,
                              valCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__pc", lag(col("close"), 1).over(w))
      .filter(col("__pc").isNotNull)
      .withColumn("__g", col("open") - col("__pc"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("__g") > 0, 1L).otherwise(0L)).as("n_gap_up"),
        sum(when(col("__g") < 0, 1L).otherwise(0L)).as("n_gap_down"),
        max(col("__g")).as("max_gap_up_cents"),
        min(col("__g")).as("max_gap_down_cents"),
        sum(abs(col("__g"))).as("sum_abs_gap_cents"),
        sum(col("__pc")).as("__spc"))
      .select(col(keyCol), col("n_days"), col("n_gap_up"),
        col("n_gap_down"), col("max_gap_up_cents"),
        col("max_gap_down_cents"), col("sum_abs_gap_cents"),
        when(col("__spc") > 0,
          col("sum_abs_gap_cents").cast("double")
            / col("__spc").cast("double")).as("gap_density"))
  }

  val defs: Map[String, Q] = Map(
    // ATR(5)/ATR(20) volatility regime ratio.
    "q_vol_ratio" -> ((s, dir) =>
      volRatio(Tables.events(s, dir), "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc, col("day").asc)),

    // Overnight gap decomposition per key.
    "q_gap_stats" -> ((s, dir) =>
      gapStats(Tables.events(s, dir), "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc)))

  /** OHLC day bars + per-key bar index (open-carrying). */
  private val ohlcIdxSql =
    """t AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id
      |  FROM events),
      |bars AS (
      |  SELECT user_id, day, max(op) AS open, max(cl) AS close,
      |    max(c) AS high, min(c) AS low
      |  FROM (
      |    SELECT user_id, day, c,
      |      first_value(c) OVER (PARTITION BY user_id, day ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS op,
      |      last_value(c) OVER (PARTITION BY user_id, day ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cl
      |    FROM t)
      |  GROUP BY user_id, day),
      |nb AS (
      |  SELECT user_id, day, open, close, high, low,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS BIGINT) AS i
      |  FROM bars)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_vol_ratio" ->
      s"""WITH RECURSIVE $ohlcIdxSql,
         |r AS (
         |  SELECT user_id, day, close, high, low, i,
         |    CAST(0 AS BIGINT) AS ss, CAST(0 AS BIGINT) AS sl,
         |    CAST(NULL AS DOUBLE) AS atrs, CAST(NULL AS DOUBLE) AS atrl
         |  FROM nb WHERE i = 1
         |  UNION ALL
         |  SELECT user_id, day, close, high, low, i,
         |    ss + tr, sl + tr,
         |    CASE WHEN j < $VrShort THEN NULL
         |      WHEN j = $VrShort
         |        THEN CAST(ss + tr AS DOUBLE) / ${VrShort.toDouble}
         |      ELSE (atrs * ${(VrShort - 1).toDouble} + CAST(tr AS DOUBLE))
         |        / ${VrShort.toDouble} END,
         |    CASE WHEN j < $VrLong THEN NULL
         |      WHEN j = $VrLong
         |        THEN CAST(sl + tr AS DOUBLE) / ${VrLong.toDouble}
         |      ELSE (atrl * ${(VrLong - 1).toDouble} + CAST(tr AS DOUBLE))
         |        / ${VrLong.toDouble} END
         |  FROM (
         |    SELECT b.user_id, b.day, b.close, b.high, b.low, b.i,
         |      b.i - 1 AS j,
         |      greatest(b.high - b.low, abs(b.high - r.close),
         |        abs(b.low - r.close)) AS tr,
         |      r.ss, r.sl, r.atrs, r.atrl
         |    FROM r JOIN nb b ON b.user_id = r.user_id AND b.i = r.i + 1))
         |SELECT user_id, day, close AS close_cents,
         |  atrs / 100.0 AS atr_short, atrl / 100.0 AS atr_long,
         |  CASE WHEN atrl > 0.0 THEN atrs / atrl END AS vol_ratio
         |FROM r
         |WHERE atrs IS NOT NULL AND atrl IS NOT NULL AND atrl > 0.0
         |ORDER BY user_id, day""".stripMargin,

    "q_gap_stats" ->
      s"""WITH $ohlcIdxSql,
         |d AS (
         |  SELECT user_id, open,
         |    lag(close) OVER (PARTITION BY user_id ORDER BY day) AS pc
         |  FROM nb),
         |g AS (
         |  SELECT user_id, open - pc AS gp, pc
         |  FROM d WHERE pc IS NOT NULL)
         |SELECT user_id, count(*) AS n_days,
         |  CAST(sum(CASE WHEN gp > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_up,
         |  CAST(sum(CASE WHEN gp < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_down,
         |  max(gp) AS max_gap_up_cents,
         |  min(gp) AS max_gap_down_cents,
         |  CAST(sum(abs(gp)) AS BIGINT) AS sum_abs_gap_cents,
         |  CASE WHEN sum(pc) > 0
         |    THEN CAST(sum(abs(gp)) AS DOUBLE) / CAST(sum(pc) AS DOUBLE)
         |  END AS gap_density
         |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)
}
