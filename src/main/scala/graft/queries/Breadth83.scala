package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Eighty-fourth wave — interval algebra by sweep line: merged
  * coverage, gap anatomy, concurrency.
  *
  *  - **q_ship_coverage**: per supplier, the UNION of their 7-day
  *    shipping windows ([shipdate, shipdate+6], integer day grain) —
  *    merged-island count, covered days, longest island. The classic
  *    running-max island build: an interval opens a new island iff its
  *    start clears the per-key running max end.
  *  - **q_ship_gaps**: the complement anatomy — idle gaps BETWEEN a
  *    supplier's merged islands (count, total idle days, longest gap),
  *    from lead() over the |islands|-bounded table.
  *  - **q_order_concurrency**: per customer nation, the maximum number
  *    of simultaneously open orders (30-day half-open [d, d+30) spans)
  *    and the first day the peak is reached. Start/end deltas collapse
  *    to per-(nation, day) nets BEFORE the sweep, so the running sum
  *    walks a |nation|·|days|-bounded table, never raw orders.
  *
  * Scale shape: island builds are per-key ordered windows after a
  * single fact scan — duplicate (s, e) rows are DEDUPED first so the
  * window order is total (round-14 tie-safety; see mergedIslands — a
  * non-total order let a duplicate inherit the previous island's
  * label, nondeterministically in both engines); the sweep
  * aggregates facts to day-grain deltas map-side first. Nothing
  * global: every window partitions by supplier / nation. All
  * arithmetic is integer days from a pinned epoch — engine-neutral. */
object Breadth83 {

  private val Epoch = "1995-01-01"
  private val ShipWin = 6  // [ship, ship+6] inclusive
  private val OrderSpan = 30 // [order, order+30) half-open

  /** Merge [__s,__e] integer intervals per key into islands.
    *
    * The interval set is DEDUPED first (round 14 — caught live as a
    * once-in-many-runs oracle flake): with duplicate (key, s, e) rows
    * the island-label running sum rides a ROWS frame whose (s, e)
    * order is not total, and the one duplicate carrying newisl = 1 can
    * be ordered AFTER its twins — those twins then inherit the
    * PREVIOUS island's label and extend it, changing covered/idle days
    * nondeterministically (tie order varies with parallel window
    * execution, in Spark AND DuckDB alike). Interval union ignores
    * multiplicity, so the dedup changes no results — it makes the
    * window order total, which makes both engines deterministic. The
    * oracle twin (islandsSql) carries the same DISTINCT. */
  private[graft] def mergedIslands(iv: DataFrame,
                                   keyCol: String): DataFrame = {
    val ivd = iv.select(col(keyCol), col("__s"), col("__e")).distinct()
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__s").asc, col("__e").asc)
    val prevMax = max(col("__e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    ivd.withColumn("__new",
        when(prevMax.isNull || col("__s") > prevMax, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__isl"))
      .agg(min(col("__s")).as("isl_s"), max(col("__e")).as("isl_e"))
  }

  private def shipIntervals(lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_suppkey"),
      datediff(col("l_shipdate").cast("date"), lit(Epoch).cast("date"))
        .cast("long").as("__s"))
      .withColumn("__e", col("__s") + ShipWin)

  /** Union coverage of 7-day ship windows per supplier. */
  private[graft] def shipCoverage(lineitem: DataFrame): DataFrame =
    mergedIslands(shipIntervals(lineitem), "l_suppkey")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("isl_e") - col("isl_s") + 1).as("covered_days"),
        max(col("isl_e") - col("isl_s") + 1).as("longest_island"))
      .orderBy(col("l_suppkey").asc)

  /** Idle-gap anatomy between merged ship islands per supplier. */
  private[graft] def shipGaps(lineitem: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("isl_s").asc)
    mergedIslands(shipIntervals(lineitem), "l_suppkey")
      .withColumn("__next", lead(col("isl_s"), 1).over(w))
      .withColumn("__gap",
        when(col("__next").isNotNull, col("__next") - col("isl_e") - 1))
      .groupBy(col("l_suppkey"))
      .agg((count(lit(1)) - 1).as("n_gaps"),
        sum(col("__gap")).as("idle_days"),
        max(col("__gap")).as("max_gap"))
      .orderBy(col("l_suppkey").asc)
  }

  /** Peak simultaneous open orders per customer nation. */
  private[graft] def orderConcurrency(nation: DataFrame, customer: DataFrame,
                                      orders: DataFrame): DataFrame = {
    val o = orders.select(col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), lit(Epoch).cast("date"))
          .cast("long").as("__s"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
    val deltas = o.select(col("n_name"), col("__s").as("__d"), lit(1L).as("__x"))
      .unionAll(o.select(col("n_name"),
        (col("__s") + OrderSpan).as("__d"), lit(-1L).as("__x")))
      .groupBy(col("n_name"), col("__d"))
      .agg(sum(col("__x")).as("__net"), // ends subtract before the day counts
        sum(when(col("__x") === 1L, 1L).otherwise(0L)).as("__starts"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("__d").asc)
    val swept = deltas
      .withColumn("__lvl", sum(col("__net"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__max", max(col("__lvl"))
        .over(Window.partitionBy(col("n_name"))))
    swept.groupBy(col("n_name"))
      .agg(sum(col("__starts")).as("n_orders"),
        max(col("__lvl")).as("max_concurrent"),
        min(when(col("__lvl") === col("__max"), col("__d"))).as("__pd"))
      .select(col("n_name"), col("n_orders"), col("max_concurrent"),
        date_add(lit(Epoch).cast("date"), col("__pd").cast("int"))
          .as("peak_day"))
      .orderBy(col("n_name").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_ship_coverage" -> ((s, dir) => shipCoverage(Tables.lineitem(s, dir))),
    "q_ship_gaps" -> ((s, dir) => shipGaps(Tables.lineitem(s, dir))),
    "q_order_concurrency" -> ((s, dir) =>
      orderConcurrency(Tables.nation(s, dir), Tables.customer(s, dir),
        Tables.orders(s, dir))))

  private val islandsSql =
    s"""iv AS (
       |  SELECT DISTINCT l_suppkey,
       |    CAST(date_diff('day', DATE '$Epoch', CAST(l_shipdate AS DATE))
       |      AS BIGINT) AS s
       |  FROM lineitem),
       |flg AS (
       |  SELECT l_suppkey, s, s + $ShipWin AS e,
       |    CASE WHEN max(s + $ShipWin) OVER (PARTITION BY l_suppkey
       |        ORDER BY s, s + $ShipWin
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |      OR s > max(s + $ShipWin) OVER (PARTITION BY l_suppkey
       |        ORDER BY s, s + $ShipWin
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      THEN 1 ELSE 0 END AS newisl
       |  FROM iv),
       |isl AS (
       |  SELECT l_suppkey,
       |    sum(newisl) OVER (PARTITION BY l_suppkey ORDER BY s, e
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl,
       |    s, e
       |  FROM flg),
       |islands AS (
       |  SELECT l_suppkey, isl, min(s) AS isl_s, max(e) AS isl_e
       |  FROM isl GROUP BY 1, 2)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_ship_coverage" ->
      s"""WITH $islandsSql
         |SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_islands,
         |  CAST(sum(isl_e - isl_s + 1) AS BIGINT) AS covered_days,
         |  CAST(max(isl_e - isl_s + 1) AS BIGINT) AS longest_island
         |FROM islands GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_ship_gaps" ->
      s"""WITH $islandsSql,
         |g AS (
         |  SELECT l_suppkey,
         |    lead(isl_s) OVER (PARTITION BY l_suppkey ORDER BY isl_s)
         |      - isl_e - 1 AS gap
         |  FROM islands)
         |SELECT l_suppkey, CAST(count(*) - 1 AS BIGINT) AS n_gaps,
         |  CAST(sum(gap) AS BIGINT) AS idle_days,
         |  CAST(max(gap) AS BIGINT) AS max_gap
         |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_order_concurrency" ->
      s"""WITH o AS (
         |  SELECT n_name,
         |    CAST(date_diff('day', DATE '$Epoch', CAST(o_orderdate AS DATE))
         |      AS BIGINT) AS s
         |  FROM orders
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey),
         |deltas AS (
         |  SELECT n_name, d, CAST(sum(x) AS BIGINT) AS net,
         |    CAST(sum(CASE WHEN x = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS starts
         |  FROM (
         |    SELECT n_name, s AS d, 1 AS x FROM o
         |    UNION ALL
         |    SELECT n_name, s + $OrderSpan AS d, -1 AS x FROM o)
         |  GROUP BY 1, 2),
         |swept AS (
         |  SELECT n_name, d, starts,
         |    sum(net) OVER (PARTITION BY n_name ORDER BY d
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lvl
         |  FROM deltas),
         |mx AS (
         |  SELECT n_name, d, starts, lvl,
         |    max(lvl) OVER (PARTITION BY n_name) AS mlvl
         |  FROM swept)
         |SELECT n_name, CAST(sum(starts) AS BIGINT) AS n_orders,
         |  CAST(max(lvl) AS BIGINT) AS max_concurrent,
         |  DATE '$Epoch' + CAST(min(CASE WHEN lvl = mlvl THEN d END)
         |    AS INTEGER) AS peak_day
         |FROM mx GROUP BY 1 ORDER BY 1""".stripMargin)
}
