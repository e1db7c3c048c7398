package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirty-sixth wave — swing structure and rolling factor exposure:
  *
  *  - **ZigZag pivots** (5% retracement): the swing-point filter
  *    charting overlays draw — an ALL-INTEGER recurrence (leg
  *    direction + leg extreme; a reversal confirms when the
  *    retracement reaches 1/20 of the extreme, the threshold a pure
  *    integer cross-multiplication), emitting the confirmed pivot on
  *    the bar that confirms it;
  *  - **rolling beta** (20-bar window — sized to the testdata's
  *    consecutive-day run lengths: a 30-bar window never fills at
  *    sf0.001, where the longest run is 26): the q_beta one-factor
  *    slope as a moving window — integer co-moment sums over
  *    calendar-consecutive day diffs against the equal-cent-weight
  *    market move, one terminal division per bar.
  *
  * Exact-parity discipline: zigzag is integer-only (no float
  * anywhere); rolling beta keeps every moment an integer window sum
  * (order-free) with the q_beta operand order in the one division.
  * Int64 headroom for the windowed moments: 20-bar sums of day-scale
  * cent moves (~10⁴) against market moves (~10⁵ per day at 10⁴ keys)
  * hold n·Σxm under 2⁶² with orders of magnitude to spare; re-base
  * the market move to coarser units at extreme breadth (the q_beta
  * note).
  *
  * Scale shape: zigzag is one bar-grid fold (O(1) state); rolling
  * beta is the bar grid + one day-keyed aggregate (the market frame)
  * + one key window — all shuffles key- or day-bounded.
  */
object Breadth36 {

  /** Retracement threshold as a rational: 1/ZigZagDen (5%). */
  private[graft] val ZigZagDen = 20L
  private[graft] val RollBetaW = 20

  /** ZigZag accumulator: leg direction, the leg's running extreme
    * (integer cents) and the day it was set (epoch day — pivots
    * report WHERE the swing peaked, not where it confirmed). */
  private[graft] case class ZigAcc(up: Boolean, ext: Long, extDay: Int)

  /** One zigzag step: on an up leg a higher close advances the
    * extreme; a retracement of at least ext/20 confirms the peak as a
    * pivot and starts a down leg at this bar (symmetric for down
    * legs). Returns (state', confirmed pivot (value, epoch day) if
    * this bar confirmed one). The comparison is the integer
    * cross-multiplication (ext − c)·20 ≥ ext — no division, no
    * float. */
  private[graft] def zigStep(st: Option[ZigAcc], c: Long,
                             day: Int): (ZigAcc, Option[(Long, Int)]) =
    st match {
      case None => (ZigAcc(up = true, ext = c, extDay = day), None)
      case Some(a) if a.up =>
        if (c > a.ext) (ZigAcc(up = true, c, day), None)
        else if ((a.ext - c) * ZigZagDen >= a.ext)
          (ZigAcc(up = false, c, day), Some((a.ext, a.extDay)))
        else (a, None)
      case Some(a) =>
        if (c < a.ext) (ZigAcc(up = false, c, day), None)
        else if ((c - a.ext) * ZigZagDen >= a.ext)
          (ZigAcc(up = true, c, day), Some((a.ext, a.extDay)))
        else (a, None)
    }

  /** ZigZag per key over the daily closes — one fold emitting, per
    * bar, the leg direction/extreme and (when this bar confirms a
    * reversal) the confirmed pivot's value and day. */
  private[graft] def zigzag(df: DataFrame, keyCol: String, tsCol: String,
                            valCol: String, tieBreak: String): DataFrame = {
    // the Bar struct carries no day, so the fold tracks the extreme as
    // a BAR INDEX (the fold order IS the day order) and the emit
    // resolves the pivot's calendar day through element_at on the same
    // sorted bar array the fold consumed
    val idxLoop = graft.ops.Recurrence.foldUdfIndexed {
      (st: Option[ZigAcc], b: graft.ops.Bar, i: Int) =>
        val (a, piv) = zigStep(st, b.close, i)
        (a, (a.up, a.ext, piv.map(_._1), piv.map(_._2)))
    }
    val arr = graft.ops.Recurrence.barArrays(df, keyCol, tsCol, valCol,
      tieBreak)
    arr.withColumn("__s",
        idxLoop.apply(graft.ops.Recurrence.foldInputs(col("__bars")): _*))
      .select(col(keyCol), col("__bars"),
        explode(zip_with(col("__bars"), col("__s"),
          (b, s) => struct(b.getField("day").as("day"),
            b.getField("close").as("close_cents"),
            s.getField("_1").as("leg_up"),
            s.getField("_2").as("leg_extreme_cents"),
            s.getField("_3").as("pivot_cents"),
            s.getField("_4").as("__pividx")))).as("r"))
      .select(col(keyCol), col("r.day"), col("r.close_cents"),
        col("r.leg_up"), col("r.leg_extreme_cents"), col("r.pivot_cents"),
        when(col("r.__pividx").isNotNull,
          element_at(col("__bars"), col("r.__pividx") + 1)
            .getField("day")).as("pivot_day"))
  }

  /** Rolling 20-bar beta per key: cov(x, M)/var(M) over the trailing
    * window of calendar-consecutive day diffs, M the same-day
    * all-keys cent-diff sum (own diff included — the q_beta index
    * convention). Full windows with positive market variance only. */
  private[graft] def rollingBeta(df: DataFrame, keyCol: String, tsCol: String,
                                 valCol: String, tieBreak: String): DataFrame = {
    val bars = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .select(col(keyCol), col("day"), col("close"))
    val cur = bars.select(col(keyCol), col("day"), col("close").as("__c1"))
    val prev = bars.select(col(keyCol), date_add(col("day"), 1).as("day"),
      col("close").as("__c0"))
    val diffs = cur.join(prev, Seq(keyCol, "day"))
      .select(col(keyCol), col("day"), (col("__c1") - col("__c0")).as("__x"))
    val mkt = diffs.groupBy(col("day")).agg(sum(col("__x")).as("__m"))
    val f = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(-(RollBetaW - 1), 0)
    diffs.join(mkt, Seq("day"))
      .withColumn("__n", count(lit(1)).over(f))
      .withColumn("__sx", sum(col("__x")).over(f))
      .withColumn("__sm", sum(col("__m")).over(f))
      .withColumn("__sxm", sum(col("__x") * col("__m")).over(f))
      .withColumn("__smm", sum(col("__m") * col("__m")).over(f))
      .filter(col("__n") === RollBetaW)
      .select(col(keyCol), col("day"),
        when(lit(RollBetaW) * col("__smm") - col("__sm") * col("__sm") > 0,
          (lit(RollBetaW) * col("__sxm") - col("__sx") * col("__sm"))
            .cast("double")
            / (lit(RollBetaW) * col("__smm") - col("__sm") * col("__sm"))
              .cast("double")).as("beta"))
  }

  val defs: Map[String, Q] = Map(
    // ZigZag 5% swing pivots (integer-only recurrence).
    "q_zigzag" -> ((s, dir) =>
      zigzag(Tables.events(s, dir), "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc, col("day").asc)),

    // Rolling 20-bar one-factor beta.
    "q_rolling_beta" -> ((s, dir) =>
      rollingBeta(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")
        .orderBy(col("user_id").asc, col("day").asc)))

  /** Close-only bars + per-key bar index. */
  private val closeBarsIdxSql =
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
      |nb AS (
      |  SELECT user_id, day, close,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS BIGINT) AS i
      |  FROM bars)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_zigzag" ->
      s"""WITH RECURSIVE $closeBarsIdxSql,
         |r AS (
         |  SELECT user_id, day, close, i,
         |    TRUE AS leg_up, close AS ext, day AS ext_day,
         |    CAST(NULL AS BIGINT) AS piv, CAST(NULL AS DATE) AS pivot_day
         |  FROM nb WHERE i = 1
         |  UNION ALL
         |  SELECT b.user_id, b.day, b.close, b.i,
         |    CASE WHEN r.leg_up THEN
         |        CASE WHEN b.close > r.ext THEN TRUE
         |          WHEN (r.ext - b.close) * $ZigZagDen >= r.ext THEN FALSE
         |          ELSE TRUE END
         |      ELSE
         |        CASE WHEN b.close < r.ext THEN FALSE
         |          WHEN (b.close - r.ext) * $ZigZagDen >= r.ext THEN TRUE
         |          ELSE FALSE END END,
         |    CASE WHEN r.leg_up THEN
         |        CASE WHEN b.close > r.ext THEN b.close
         |          WHEN (r.ext - b.close) * $ZigZagDen >= r.ext THEN b.close
         |          ELSE r.ext END
         |      ELSE
         |        CASE WHEN b.close < r.ext THEN b.close
         |          WHEN (b.close - r.ext) * $ZigZagDen >= r.ext THEN b.close
         |          ELSE r.ext END END,
         |    CASE WHEN r.leg_up THEN
         |        CASE WHEN b.close > r.ext THEN b.day
         |          WHEN (r.ext - b.close) * $ZigZagDen >= r.ext THEN b.day
         |          ELSE r.ext_day END
         |      ELSE
         |        CASE WHEN b.close < r.ext THEN b.day
         |          WHEN (b.close - r.ext) * $ZigZagDen >= r.ext THEN b.day
         |          ELSE r.ext_day END END,
         |    CASE WHEN r.leg_up AND b.close <= r.ext
         |          AND (r.ext - b.close) * $ZigZagDen >= r.ext THEN r.ext
         |      WHEN NOT r.leg_up AND b.close >= r.ext
         |          AND (b.close - r.ext) * $ZigZagDen >= r.ext THEN r.ext
         |      END,
         |    CASE WHEN r.leg_up AND b.close <= r.ext
         |          AND (r.ext - b.close) * $ZigZagDen >= r.ext THEN r.ext_day
         |      WHEN NOT r.leg_up AND b.close >= r.ext
         |          AND (b.close - r.ext) * $ZigZagDen >= r.ext THEN r.ext_day
         |      END
         |  FROM r JOIN nb b ON b.user_id = r.user_id AND b.i = r.i + 1)
         |SELECT user_id, day, close AS close_cents, leg_up,
         |  ext AS leg_extreme_cents, piv AS pivot_cents, pivot_day
         |FROM r ORDER BY user_id, day""".stripMargin,

    "q_rolling_beta" ->
      s"""WITH $closeBarsIdxSql,
         |d AS (
         |  SELECT c1.user_id, c1.day, c1.close - c0.close AS x
         |  FROM nb c1 JOIN nb c0
         |    ON c0.user_id = c1.user_id AND c0.day + 1 = c1.day),
         |m AS (SELECT day, CAST(sum(x) AS BIGINT) AS mm FROM d GROUP BY day),
         |f AS (
         |  SELECT d.user_id, d.day,
         |    count(*) OVER w AS n,
         |    CAST(sum(d.x) OVER w AS BIGINT) AS sx,
         |    CAST(sum(m.mm) OVER w AS BIGINT) AS sm,
         |    CAST(sum(d.x * m.mm) OVER w AS BIGINT) AS sxm,
         |    CAST(sum(m.mm * m.mm) OVER w AS BIGINT) AS smm
         |  FROM d JOIN m USING (day)
         |  WINDOW w AS (PARTITION BY d.user_id ORDER BY d.day
         |    ROWS BETWEEN ${RollBetaW - 1} PRECEDING AND CURRENT ROW))
         |SELECT user_id, day,
         |  CASE WHEN $RollBetaW * smm - sm * sm > 0
         |    THEN CAST($RollBetaW * sxm - sx * sm AS DOUBLE)
         |      / CAST($RollBetaW * smm - sm * sm AS DOUBLE) END AS beta
         |FROM f WHERE n = $RollBetaW ORDER BY user_id, day""".stripMargin)
}
