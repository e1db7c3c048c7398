package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirty-ninth wave — MARKET-BREADTH indicators: the cross-sectional
  * row (one value per DAY across all keys) none of the per-key waves
  * cover:
  *
  *  - **advance/decline line + McClellan oscillator**: per day, the
  *    count of keys whose close rose vs fell (vs their own prior
  *    PRESENT day), the cumulative A/D line, and the McClellan
  *    EMA(19)−EMA(39) pair over the daily net advances;
  *  - **new highs / new lows**: per day, how many keys closed at
  *    their trailing 20-bar high/low (full windows only) — the
  *    breadth-thrust diagnostic.
  *
  * Exact-parity discipline: advances/declines/net are integer counts;
  * the A/D line is an integer running sum (order-free under the day
  * ordering); the McClellan EMAs fold over the single market series
  * in day order with alphas as divisions (the EMA-family discipline —
  * the oracle is a recursive CTE over the day-indexed net series);
  * high/low flags are integer comparisons.
  *
  * Scale shape: per-key day diffs ride the memoized bar grid; the day
  * roll-up is one day-keyed aggregate (|days| rows); the McClellan
  * fold collects the |days|-bounded market series once (calendar-
  * bounded, the Recurrence rationale) — no driver state. */
object Breadth39 {

  private[graft] val McFastA = 2.0 / 20.0
  private[graft] val McSlowA = 2.0 / 40.0
  private[graft] val NhWindow = 20

  /** One McClellan step — both EMAs seed at the first net value. */
  private[graft] def mcStep(st: Option[(Double, Double)],
                            net: Long): (Double, Double) = st match {
    case None => (net.toDouble, net.toDouble)
    case Some((f, s)) =>
      (McFastA * net + (1.0 - McFastA) * f,
        McSlowA * net + (1.0 - McSlowA) * s)
  }

  /** Daily advance/decline counts, the cumulative A/D line and the
    * McClellan oscillator over net advances. Day 1 of each key has no
    * prior close and counts toward neither side. */
  private[graft] def adLine(df: DataFrame, keyCol: String, tsCol: String,
                            valCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val daily = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__pc", lag(col("close"), 1).over(w))
      .filter(col("__pc").isNotNull)
      .groupBy(col("day"))
      .agg(sum(when(col("close") > col("__pc"), 1L).otherwise(0L))
          .as("n_adv"),
        sum(when(col("close") < col("__pc"), 1L).otherwise(0L))
          .as("n_dec"))
      .withColumn("net", col("n_adv") - col("n_dec"))
    val run = Window.orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val lined = daily.withColumn("ad_line", sum(col("net")).over(run))
    // McClellan: fold the |days|-bounded market series in day order
    // (one array per corpus — the calendar-bounded Recurrence shape)
    val mcUdf = udf { (nets: Seq[Long]) =>
      var st: Option[(Double, Double)] = None
      nets.map { n =>
        val s = mcStep(st, n)
        st = Some(s)
        s._1 - s._2
      }
    }
    val folded = lined.groupBy(lit(1).as("__g"))
      .agg(sort_array(collect_list(struct(col("day"), col("n_adv"),
        col("n_dec"), col("net"), col("ad_line")))).as("__rows"))
      .withColumn("__mc",
        mcUdf(transform(col("__rows"), _.getField("net"))))
      .select(explode(zip_with(col("__rows"), col("__mc"),
        (r, m) => struct(r.getField("day").as("day"),
          r.getField("n_adv").as("n_adv"),
          r.getField("n_dec").as("n_dec"),
          r.getField("net").as("net"),
          r.getField("ad_line").as("ad_line"),
          m.as("mcclellan")))).as("r"))
      .select(col("r.*"))
    folded
  }

  /** New 20-bar highs/lows per day: a key scores a new high when its
    * close equals its trailing 20-bar max (full windows only; doji
    * days can score both sides). */
  private[graft] def newExtremes(df: DataFrame, keyCol: String, tsCol: String,
                                 valCol: String, tieBreak: String): DataFrame = {
    val f = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(-(NhWindow - 1), 0)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__n", count(lit(1)).over(f))
      .withColumn("__mx", max(col("close")).over(f))
      .withColumn("__mn", min(col("close")).over(f))
      .filter(col("__n") === NhWindow)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_scored"),
        sum(when(col("close") === col("__mx"), 1L).otherwise(0L))
          .as("n_new_highs"),
        sum(when(col("close") === col("__mn"), 1L).otherwise(0L))
          .as("n_new_lows"))
  }

  val defs: Map[String, Q] = Map(
    // Advance/decline line + McClellan oscillator (market breadth).
    "q_ad_line" -> ((s, dir) =>
      adLine(Tables.events(s, dir), "user_id", "ts", "value", "event_id")
        .orderBy(col("day").asc)),

    // New 20-bar highs/lows per day.
    "q_new_extremes" -> ((s, dir) =>
      newExtremes(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")
        .orderBy(col("day").asc)))

  /** Close bars with per-key prior close. */
  private val diffBarsSql =
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
      |d AS (
      |  SELECT user_id, day, close,
      |    lag(close) OVER (PARTITION BY user_id ORDER BY day) AS pc
      |  FROM bars)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_ad_line" ->
      s"""WITH RECURSIVE $diffBarsSql,
         |daily AS (
         |  SELECT day,
         |    CAST(sum(CASE WHEN close > pc THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_adv,
         |    CAST(sum(CASE WHEN close < pc THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dec
         |  FROM d WHERE pc IS NOT NULL GROUP BY day),
         |lined AS (
         |  SELECT day, n_adv, n_dec, n_adv - n_dec AS net,
         |    CAST(sum(n_adv - n_dec) OVER (ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS ad_line,
         |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
         |  FROM daily),
         |r AS (
         |  SELECT day, n_adv, n_dec, net, ad_line, i,
         |    CAST(net AS DOUBLE) AS ef, CAST(net AS DOUBLE) AS es
         |  FROM lined WHERE i = 1
         |  UNION ALL
         |  SELECT b.day, b.n_adv, b.n_dec, b.net, b.ad_line, b.i,
         |    (2.0/20.0) * CAST(b.net AS DOUBLE) + (1.0 - 2.0/20.0) * r.ef,
         |    (2.0/40.0) * CAST(b.net AS DOUBLE) + (1.0 - 2.0/40.0) * r.es
         |  FROM r JOIN lined b ON b.i = r.i + 1)
         |SELECT day, n_adv, n_dec, net, ad_line, ef - es AS mcclellan
         |FROM r ORDER BY day""".stripMargin,

    "q_new_extremes" ->
      s"""WITH $diffBarsSql,
         |f AS (
         |  SELECT user_id, day, close,
         |    count(*) OVER w AS n,
         |    max(close) OVER w AS mx, min(close) OVER w AS mn
         |  FROM bars
         |  WINDOW w AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN ${NhWindow - 1} PRECEDING AND CURRENT ROW))
         |SELECT day, count(*) AS n_scored,
         |  CAST(sum(CASE WHEN close = mx THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_new_highs,
         |  CAST(sum(CASE WHEN close = mn THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_new_lows
         |FROM f WHERE n = $NhWindow
         |GROUP BY day ORDER BY day""".stripMargin)
}
