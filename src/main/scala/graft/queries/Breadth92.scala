package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ninety-third wave — long-horizon momentum composites and volatility
  * stops, all with integer numerators (the cent-ROC discipline: price
  * momenta stay cent differences, so every smoothing window is an
  * exact int64 sum and each emitted value is ONE division).
  *
  *  - **q_coppock**: the Coppock curve, cent-denominated — WMA(10,
  *    weights 1..10) of (ROC14 + ROC11); the weighted numerator is ten
  *    lag terms summed exactly, denominator 55, one division.
  *  - **q_kst**: Pring's Know Sure Thing — Σ i·SMA(ROC_k), re-timed
  *    to the testdata's ~22-30 bars per key (the vacuous-pass hazard:
  *    the classic 10/15/20/30 lags never finish warming on this
  *    calendar): k = 4/5/6/8 with SMA windows 4/4/4/6. Common
  *    denominator 12 makes kst·12 an integer (3·s1 + 6·s2 + 9·s3 +
  *    8·s4); the signal line is the 4-bar SMA of that SAME integer
  *    (denominator 48) — no float window mean anywhere.
  *  - **q_chandelier**: chandelier exits over 22 bars — long stop
  *    hh22 − 3·ATR22, short stop ll22 + 3·ATR22 with the simple-mean
  *    ATR of q_atr: both stops are (integer·22 ∓ 3·ΣTR)/2200 — exact
  *    numerators, one division, emitted in price units.
  *
  * Scale shape: one memoized bar build per key, per-key ordered
  * windows, warm-up gated by window COUNTS (never sum-over-partial:
  * window sums skip nulls, so every gate counts the non-null inputs
  * in frame). */
object Breadth92 {

  private[graft] val ChW = 22

  /** Coppock curve (cent WMA(10) of ROC14 + ROC11) per key. */
  private[graft] def coppock(df: DataFrame, keyCol: String, tsCol: String,
                             valCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val withRoc = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__csum",
        (col("close") - lag(col("close"), 14).over(w)) +
          (col("close") - lag(col("close"), 11).over(w)))
    val num = (0 until 10).map(j =>
      lit(10L - j) * lag(col("__csum"), j).over(w))
      .reduce(_ + _)
    withRoc.withColumn("__num", num)
      .filter(col("__num").isNotNull)
      .select(col(keyCol), col("day"),
        (col("__num").cast("double") / lit(55.0)).as("coppock"))
      .orderBy(col(keyCol).asc, col("day").asc)
  }

  /** Know Sure Thing + signal line per key, exact numerators. */
  private[graft] def kst(df: DataFrame, keyCol: String, tsCol: String,
                         valCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    def roc(k: Int) = col("close") - lag(col("close"), k).over(w)
    def smaSum(c: org.apache.spark.sql.Column, win: Int) = {
      val f = w.rowsBetween(-(win - 1), 0)
      (sum(c).over(f), count(c).over(f))
    }
    val bars = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__r4", roc(4)).withColumn("__r5", roc(5))
      .withColumn("__r6", roc(6)).withColumn("__r8", roc(8))
    val (s1, c1) = smaSum(col("__r4"), 4)
    val (s2, c2) = smaSum(col("__r5"), 4)
    val (s3, c3) = smaSum(col("__r6"), 4)
    val (s4, c4) = smaSum(col("__r8"), 6)
    val kst12 = when(c1 === 4 && c2 === 4 && c3 === 4 && c4 === 6,
      lit(3L) * s1 + lit(6L) * s2 + lit(9L) * s3 + lit(8L) * s4)
    val withK = bars.withColumn("__k12", kst12)
    val f4 = w.rowsBetween(-3, 0)
    withK
      .withColumn("__sig4", sum(col("__k12")).over(f4))
      .withColumn("__n4", count(col("__k12")).over(f4))
      .filter(col("__k12").isNotNull)
      .select(col(keyCol), col("day"),
        (col("__k12").cast("double") / lit(12.0)).as("kst"),
        when(col("__n4") === 4,
          col("__sig4").cast("double") / lit(48.0)).as("kst_signal"))
      .orderBy(col(keyCol).asc, col("day").asc)
  }

  /** Chandelier long/short exits over `w` bars (simple-mean ATR). */
  private[graft] def chandelier(df: DataFrame, keyCol: String, tsCol: String,
                                valCol: String, tieBreak: String,
                                w: Int = ChW): DataFrame = {
    val days = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val frame = days.rowsBetween(-(w - 1), 0)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__pc", lag(col("close"), 1).over(days))
      .withColumn("__tr",
        when(col("__pc").isNotNull,
          greatest(col("high") - col("low"),
            abs(col("high") - col("__pc")),
            abs(col("low") - col("__pc"))))
          .otherwise(col("high") - col("low")))
      .withColumn("__nb", count(lit(1)).over(frame))
      .withColumn("__hh", max(col("high")).over(frame))
      .withColumn("__ll", min(col("low")).over(frame))
      .withColumn("__str", sum(col("__tr")).over(frame))
      .filter(col("__nb") === w)
      .select(col(keyCol), col("day"),
        ((col("__hh") * w - lit(3L) * col("__str")).cast("double") /
          lit(w * 100.0)).as("stop_long"),
        ((col("__ll") * w + lit(3L) * col("__str")).cast("double") /
          lit(w * 100.0)).as("stop_short"))
      .orderBy(col(keyCol).asc, col("day").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_coppock" -> ((s, dir) =>
      coppock(Tables.events(s, dir), "user_id", "ts", "value", "event_id")),
    "q_kst" -> ((s, dir) =>
      kst(Tables.events(s, dir), "user_id", "ts", "value", "event_id")),
    "q_chandelier" -> ((s, dir) =>
      chandelier(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")))

  private val barsSql =
    """t AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id
      |  FROM events),
      |bars AS (
      |  SELECT user_id, day, max(hi) AS high, max(lo2) AS low,
      |    max(cl) AS close
      |  FROM (
      |    SELECT user_id, day, max(c) OVER wd AS hi, min(c) OVER wd AS lo2,
      |      last_value(c) OVER (PARTITION BY user_id, day
      |        ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |        AS cl
      |    FROM t
      |    WINDOW wd AS (PARTITION BY user_id, day))
      |  GROUP BY user_id, day)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_coppock" -> {
      val lags = (0 until 10).map(j =>
        s"(${10 - j}) * lag(csum, $j) OVER (PARTITION BY user_id ORDER BY day)")
        .mkString(" + ")
      s"""WITH $barsSql,
         |r AS (
         |  SELECT user_id, day,
         |    (close - lag(close, 14) OVER (PARTITION BY user_id
         |      ORDER BY day))
         |    + (close - lag(close, 11) OVER (PARTITION BY user_id
         |      ORDER BY day)) AS csum
         |  FROM bars),
         |n AS (
         |  SELECT user_id, day, $lags AS num FROM r)
         |SELECT user_id, day, CAST(num AS DOUBLE) / 55.0 AS coppock
         |FROM n WHERE num IS NOT NULL
         |ORDER BY user_id, day""".stripMargin
    },

    "q_kst" ->
      s"""WITH $barsSql,
         |r AS (
         |  SELECT user_id, day,
         |    close - lag(close, 4) OVER wk AS r4,
         |    close - lag(close, 5) OVER wk AS r5,
         |    close - lag(close, 6) OVER wk AS r6,
         |    close - lag(close, 8) OVER wk AS r8
         |  FROM bars
         |  WINDOW wk AS (PARTITION BY user_id ORDER BY day)),
         |s AS (
         |  SELECT user_id, day,
         |    CASE WHEN count(r4) OVER w4 = 4
         |        AND count(r5) OVER w4 = 4
         |        AND count(r6) OVER w4 = 4
         |        AND count(r8) OVER w6 = 6 THEN
         |      3 * CAST(sum(r4) OVER w4 AS BIGINT)
         |      + 6 * CAST(sum(r5) OVER w4 AS BIGINT)
         |      + 9 * CAST(sum(r6) OVER w4 AS BIGINT)
         |      + 8 * CAST(sum(r8) OVER w6 AS BIGINT)
         |    END AS k12
         |  FROM r
         |  WINDOW w4 AS (PARTITION BY user_id ORDER BY day
         |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
         |    w6 AS (PARTITION BY user_id ORDER BY day
         |      ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)),
         |sig AS (
         |  SELECT user_id, day, k12,
         |    CAST(sum(k12) OVER w4s AS BIGINT) AS s4,
         |    count(k12) OVER w4s AS n4
         |  FROM s
         |  WINDOW w4s AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
         |SELECT user_id, day, CAST(k12 AS DOUBLE) / 12.0 AS kst,
         |  CASE WHEN n4 = 4 THEN CAST(s4 AS DOUBLE) / 48.0 END
         |    AS kst_signal
         |FROM sig WHERE k12 IS NOT NULL
         |ORDER BY user_id, day""".stripMargin,

    "q_chandelier" ->
      s"""WITH $barsSql,
         |tr AS (
         |  SELECT user_id, day, high, low, close,
         |    CASE WHEN lag(close) OVER wk IS NOT NULL THEN
         |      greatest(high - low, abs(high - lag(close) OVER wk),
         |        abs(low - lag(close) OVER wk))
         |    ELSE high - low END AS tr
         |  FROM bars
         |  WINDOW wk AS (PARTITION BY user_id ORDER BY day)),
         |f AS (
         |  SELECT user_id, day,
         |    count(*) OVER wf AS nb,
         |    CAST(max(high) OVER wf AS BIGINT) AS hh,
         |    CAST(min(low) OVER wf AS BIGINT) AS ll,
         |    CAST(sum(tr) OVER wf AS BIGINT) AS str
         |  FROM tr
         |  WINDOW wf AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN ${ChW - 1} PRECEDING AND CURRENT ROW))
         |SELECT user_id, day,
         |  CAST(hh * $ChW - 3 * str AS DOUBLE) / ${ChW * 100}.0
         |    AS stop_long,
         |  CAST(ll * $ChW + 3 * str AS DOUBLE) / ${ChW * 100}.0
         |    AS stop_short
         |FROM f WHERE nb = $ChW
         |ORDER BY user_id, day""".stripMargin)
}
