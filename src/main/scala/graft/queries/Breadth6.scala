package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixth relational wave — the warehouse-maintenance patterns a 100 TB
  * deployment runs daily, each expressed in its scale-correct shape:
  *
  *  - point-in-interval RANGE JOIN via day-bucket expansion (equi-join,
  *    never a BroadcastNestedLoopJoin);
  *  - SCD2 dimension build from a change feed (change-collapse + validity
  *    intervals, one shuffle);
  *  - incremental materialized-view maintenance (merge algebraic partials
  *    of base + delta instead of recomputing the world);
  *  - manually salted equi-join (the hot-key remedy when AQE skew
  *    splitting is unavailable), whose oracle is the PLAIN join —
  *    identical results is the contract.
  *
  * Parity discipline as everywhere: integer counts stay integral, double
  * sums of 2-dp inputs round at 2 dp after the final merge (cut digit
  * provably far from the binary noise floor), every output totally
  * ordered.
  */
object Breadth6 {

  /** Interval length for the range join (days, end-exclusive). */
  private val RangeDays = 7

  /** Change-feed split point for incremental maintenance: rows below are
    * the materialized base, rows at/above are the delta. 500 keeps both
    * sides non-empty at every gate SF (event_id is dense from 0). */
  private val IncrementalCutoff = 500L

  val defs: Map[String, Q] = Map(
    // Point-in-interval range join: each sampled order opens a 7-day
    // promo window [o_orderdate, +7d); count/sum the lineitems SHIPPED in
    // that window — no key relates the two sides, only the time range.
    // The naive plan for a non-equi join is a nested-loop product (at
    // 100 TB: dead). The bucket-join form (interval → 7 day buckets,
    // points keyed by day) fixes that but still costs Θ(matches) — and
    // the sf0.1→sf1 measurement showed matches growing 100× (2.5M →
    // 252M) when both sides scale 10×, which the bench recorded as the
    // worst super-linear query. Because the output is AGGREGATES per
    // interval (never match rows) and the interval bounds are
    // midnight-aligned dates — so day-bucket membership IS the exact
    // range predicate — the points side collapses to its
    // |ship-days|-sized per-day aggregate BEFORE the join: each point is
    // touched exactly once, the join is |intervals|·7 rows against a
    // calendar-sized table, and total work is Θ(|points| + |intervals|),
    // linear at any scale. Per-day sums of the integer-valued quantity
    // doubles are exact, so the two-level sum is bit-equal to the
    // oracle's single-level one. (For sub-day interval edges the edge
    // days would need an exact pass — these bounds are whole days.)
    "q_range_join" -> ((s, dir) => {
      val iv = Tables.orders(s, dir)
        .filter(pmod(col("o_orderkey"), lit(100)) === 0)
        .select(col("o_orderkey").as("iv_id"),
          col("o_orderdate").cast("date").as("iv_start"),
          date_add(col("o_orderdate").cast("date"), RangeDays).as("iv_end"))
      val days = iv.withColumn("day",
        explode(sequence(col("iv_start"), date_add(col("iv_end"), -1))))
      val dayAgg = Tables.lineitem(s, dir)
        .groupBy(col("l_shipdate").cast("date").as("day"))
        .agg(count(lit(1)).as("__n"), sum("l_quantity").as("__q"))
      days.join(dayAgg, Seq("day"))
        .groupBy(col("iv_id"))
        .agg(sum(col("__n")).as("n_ship"), sum(col("__q")).as("sum_qty"))
        .orderBy(col("iv_id").asc)
    }),

    // SCD2 dimension build from the change feed: purchase events are
    // attribute snapshots per user. Collapse no-op changes (same value as
    // the previous snapshot), then each surviving change opens a validity
    // interval [ts, next-change ts), the last one open-ended
    // (is_current). Both window passes share one (user_id)-partitioned
    // (ts, event_id)-ordered sort — a single shuffle, distributed by key,
    // never a global sort. This is the batch shape of CDC compaction.
    "q_scd2" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("__prev", lag(col("value"), 1).over(w))
        .filter(col("__prev").isNull || col("__prev") =!= col("value"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_id").as("change_id"),
          col("value"), col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .orderBy(col("user_id").asc, col("valid_from").asc, col("change_id").asc)
    }),

    // Incremental materialized-view maintenance: the per-(type, day)
    // aggregate is ALGEBRAIC (count, sum), so yesterday's materialized
    // base merges with today's delta partials — a full-outer on the group
    // key + partial addition — instead of re-aggregating the whole fact
    // table. At 100 TB this is the difference between touching one day
    // and touching a decade. The oracle IS the full recompute: merged
    // partials must equal it exactly.
    "q_incremental_agg" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      def partials(df: DataFrame) = df
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"), sum("value").as("s"))
      val base = partials(e.filter(col("event_id") < IncrementalCutoff))
        .withColumnRenamed("n", "bn").withColumnRenamed("s", "bs")
      val delta = partials(e.filter(col("event_id") >= IncrementalCutoff))
        .withColumnRenamed("n", "dn").withColumnRenamed("s", "ds")
      base.join(delta, Seq("event_type", "day"), "full_outer")
        .select(col("event_type"), col("day"),
          (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
          round(coalesce(col("bs"), lit(0.0)) + coalesce(col("ds"), lit(0.0)), 2)
            .as("sum_value"))
        .orderBy(col("event_type").asc, col("day").asc)
    }),

    // Manually salted fact×dim equi-join: dim rows replicate across 8
    // salt shards, fact rows pick a deterministic shard from a per-row
    // column — a hot customer's probe rows spread over 8 tasks instead of
    // one straggler. The oracle states the PLAIN join: replication ×
    // disjoint shards partition the matched pairs, so results are
    // identical — that equality is the operator's contract. (With AQE
    // available, skew-join splitting does this without the dim blow-up;
    // the manual form is for engines/paths where it is not.)
    "q_skew_join" -> ((s, dir) => {
      graft.ops.Skew.saltedEquiJoin(
          Tables.orders(s, dir), Tables.customer(s, dir),
          "o_custkey", "c_custkey", "o_orderkey", saltBuckets = 8)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy(col("c_nationkey").asc)
    }))

  val oracle: Map[String, String] = Map(
    // The oracle states the range join DECLARATIVELY (inequality join) —
    // DuckDB plans its own IEJoin; the engine's bucket expansion must
    // reproduce the same matches exactly.
    "q_range_join" ->
      s"""SELECT o.o_orderkey AS iv_id, count(*) AS n_ship,
         |  sum(l.l_quantity) AS sum_qty
         |FROM orders o JOIN lineitem l
         |  ON l.l_shipdate >= o.o_orderdate
         | AND l.l_shipdate < o.o_orderdate + INTERVAL $RangeDays DAY
         |WHERE o.o_orderkey % 100 = 0
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_scd2" ->
      """WITH ch AS (
        |  SELECT user_id, ts, event_id, value,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events WHERE event_type = 'purchase'),
        |kept AS (
        |  SELECT user_id, ts, event_id, value FROM ch
        |  WHERE prev IS NULL OR prev <> value)
        |SELECT user_id, event_id AS change_id, value, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    AS is_current
        |FROM kept ORDER BY user_id, valid_from, change_id""".stripMargin,

    // Full recompute — the merged base+delta partials must equal it.
    "q_incremental_agg" ->
      """SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Plain join — salted results must be indistinguishable.
    "q_skew_join" ->
      """SELECT c_nationkey, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
