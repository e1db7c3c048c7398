package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixty-sixth wave — market-breadth oscillator and independence test.
  *
  *  - **q_mcclellan**: the McClellan oscillator — per day, net
  *    advances (#keys whose daily close rose − #fell, from the shared
  *    memoized cent bars), then EMA(19) − EMA(39) of that single
  *    GLOBAL day series. The market-breadth sibling of q_ad_line's
  *    cumulative line: the day grid is calendar-bounded, so the whole
  *    recurrence folds over one ≤|days| array in a single UDF call
  *    (the Recurrence-combinator rationale at its global degenerate:
  *    one key), seeded at the first day like every EMA in the family.
  *  - **q_chi2**: Pearson's χ² test of independence between event
  *    type and day-of-week (day index mod 7 — pure arithmetic, no
  *    engine-specific DOW numbering). Observed counts are exact; the
  *    ≤|types|·7-cell term sum runs as an ORDERED running window sum
  *    so both engines accumulate in the same cell order, and the
  *    emitted χ² is 6-dp-rounded to absorb any segment-tree vs
  *    incremental last-ulp difference in the window sum.
  *
  * Scale shape: q_mcclellan reuses the memoized bar grid (one
  * |keys|·|days| shuffle) plus a |days|-row global fold; q_chi2 is one
  * map-side-combinable groupBy to ≤|types|·7 cells and window passes
  * over those cells only. */
object Breadth65 {

  private[graft] val McA19 = 2.0 / 20.0
  private[graft] val McA39 = 2.0 / 40.0

  private[graft] val mcFold =
    udf { (days: Seq[java.sql.Date], nets: Seq[Long]) =>
      var e19 = 0.0; var e39 = 0.0
      days.zip(nets).zipWithIndex.map { case ((d, x), i) =>
        if (i == 0) { e19 = x.toDouble; e39 = x.toDouble }
        else {
          e19 = McA19 * x.toDouble + (1.0 - McA19) * e19
          e39 = McA39 * x.toDouble + (1.0 - McA39) * e39
        }
        (d, x, e19, e39)
      }
    }

  /** EMA(19)−EMA(39) of daily net advances over the cent-bar grid. */
  private[graft] def mcclellan(df: DataFrame, keyCol: String,
                               tsCol: String, valCol: String,
                               tieBreak: String): DataFrame = {
    val bars = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val net = bars
      .withColumn("__pc", lag(col("close"), 1).over(byKey))
      .filter(col("__pc").isNotNull)
      .withColumn("__sgn",
        when(col("close") > col("__pc"), 1L)
          .when(col("close") < col("__pc"), -1L).otherwise(0L))
      .groupBy(col("day")).agg(sum(col("__sgn")).as("net"))
    net
      .agg(sort_array(collect_list(struct(col("day"), col("net"))))
        .as("__b"))
      .select(explode(mcFold(
        transform(col("__b"), x => x.getField("day")),
        transform(col("__b"), x => x.getField("net")))).as("r"))
      .select(col("r._1").as("day"), col("r._2").as("net_adv"),
        col("r._3").as("ema19"), col("r._4").as("ema39"),
        (col("r._3") - col("r._4")).as("mcclellan"))
      .orderBy(col("day").asc)
  }

  /** Pearson χ² of independence: `typeCol` × (day index mod 7). */
  private[graft] def chi2(df: DataFrame, typeCol: String,
                          tsCol: String, epoch: String): DataFrame = {
    val cells = df
      .withColumn("__dow",
        expr(s"datediff(cast($tsCol as date), date'$epoch') % 7"))
      .groupBy(col(typeCol), col("__dow"))
      .agg(count(lit(1)).as("__o"))
    val wRow = Window.partitionBy(col(typeCol))
    val wCol = Window.partitionBy(col("__dow"))
    val wAll = Window.partitionBy()
    val ordW = Window.orderBy(col(typeCol).asc, col("__dow").asc)
    val run = cells
      .withColumn("__n", sum(col("__o")).over(wAll))
      .withColumn("__e",
        sum(col("__o")).over(wRow).cast("double") *
          sum(col("__o")).over(wCol).cast("double") /
          col("__n").cast("double"))
      .withColumn("__term",
        (col("__o").cast("double") - col("__e")) *
          (col("__o").cast("double") - col("__e")) / col("__e"))
      .withColumn("__chi", sum(col("__term")).over(
        ordW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__rn", row_number().over(ordW))
      .withColumn("__cnt", count(lit(1)).over(wAll))
      .filter(col("__rn") === col("__cnt"))
    val dims = cells.agg(
      countDistinct(col(typeCol)).as("__r"),
      countDistinct(col("__dow")).as("__c"))
    run.crossJoin(broadcast(dims))
      .select(col("__n").as("n_obs"),
        ((col("__r") - 1) * (col("__c") - 1)).as("dof"),
        round(col("__chi"), 6).as("chi2"))
  }

  val defs: Map[String, Q] = Map(
    "q_mcclellan" -> ((s, dir) =>
      mcclellan(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_chi2" -> ((s, dir) =>
      chi2(Tables.events(s, dir), "event_type", "ts", "2024-01-01")))

  val oracle: Map[String, String] = Map(
    "q_mcclellan" ->
      """WITH RECURSIVE t AS (
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
        |net AS (
        |  SELECT day, CAST(sum(sgn) AS BIGINT) AS net FROM (
        |    SELECT day,
        |      CASE WHEN close > lag(close) OVER (PARTITION BY user_id
        |          ORDER BY day) THEN 1
        |        WHEN close < lag(close) OVER (PARTITION BY user_id
        |          ORDER BY day) THEN -1
        |        ELSE 0 END AS sgn,
        |      lag(close) OVER (PARTITION BY user_id ORDER BY day) AS pc
        |    FROM bars)
        |  WHERE pc IS NOT NULL GROUP BY day),
        |nb AS (
        |  SELECT day, net,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
        |  FROM net),
        |m AS (
        |  SELECT day, net, i,
        |    CAST(net AS DOUBLE) AS e19, CAST(net AS DOUBLE) AS e39
        |  FROM nb WHERE i = 1
        |  UNION ALL
        |  SELECT b.day, b.net, b.i,
        |    (2.0/20.0) * CAST(b.net AS DOUBLE)
        |      + (1.0 - 2.0/20.0) * m.e19,
        |    (2.0/40.0) * CAST(b.net AS DOUBLE)
        |      + (1.0 - 2.0/40.0) * m.e39
        |  FROM m JOIN nb b ON b.i = m.i + 1)
        |SELECT day, net AS net_adv, e19 AS ema19, e39 AS ema39,
        |  e19 - e39 AS mcclellan
        |FROM m ORDER BY day""".stripMargin,

    "q_chi2" ->
      """WITH cells AS (
        |  SELECT event_type,
        |    datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
        |      AS dow,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |terms AS (
        |  SELECT event_type, dow, o,
        |    CAST(sum(o) OVER () AS BIGINT) AS n,
        |    (CAST(o AS DOUBLE)
        |      - CAST(sum(o) OVER (PARTITION BY event_type) AS DOUBLE)
        |        * CAST(sum(o) OVER (PARTITION BY dow) AS DOUBLE)
        |        / CAST(sum(o) OVER () AS DOUBLE))
        |    * (CAST(o AS DOUBLE)
        |      - CAST(sum(o) OVER (PARTITION BY event_type) AS DOUBLE)
        |        * CAST(sum(o) OVER (PARTITION BY dow) AS DOUBLE)
        |        / CAST(sum(o) OVER () AS DOUBLE))
        |    / (CAST(sum(o) OVER (PARTITION BY event_type) AS DOUBLE)
        |        * CAST(sum(o) OVER (PARTITION BY dow) AS DOUBLE)
        |        / CAST(sum(o) OVER () AS DOUBLE)) AS term
        |  FROM cells),
        |run AS (
        |  SELECT n,
        |    sum(term) OVER (ORDER BY event_type, dow
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chi,
        |    row_number() OVER (ORDER BY event_type, dow) AS rn,
        |    count(*) OVER () AS cnt
        |  FROM terms),
        |dims AS (
        |  SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS r,
        |    CAST(count(DISTINCT dow) AS BIGINT) AS c
        |  FROM cells)
        |SELECT run.n AS n_obs, (dims.r - 1) * (dims.c - 1) AS dof,
        |  round(run.chi, 6) AS chi2
        |FROM run, dims WHERE run.rn = run.cnt""".stripMargin)
}
