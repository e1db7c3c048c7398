package graft.queries

import graft.Tables
import graft.ops.{Latest, TopK}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-capability breadth beyond the reference's literal surface
  * (SURVEY.md §7.2 P2): aggregate families, join variants (broadcast /
  * shuffle / semi / anti / multi-way), window functions, rollup/cube,
  * as-of. Each derived double is rounded before it is ranked or compared,
  * so the DuckDB differential check is ulp-proof.
  */
object Breadth {

  val defs: Map[String, Q] = Map(
    // TPC-H Q1-shaped hash aggregate: partial+final agg, whole-stage
    // codegen, 6 output groups from 600k rows at sf0.1.
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= to_timestamp_ntz(lit("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)
    }),

    // A1 family: count / exact distinct / min / max / avg / sum / stddev.
    "q_agg_stats" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          min("value").as("min_value"),
          max("value").as("max_value"),
          round(avg("value"), 4).as("avg_value"),
          round(sum("value"), 2).as("sum_value"),
          round(stddev_samp(col("value")), 4).as("sd_value"))
        .orderBy(col("event_type").asc)
    }),

    // Hierarchical rollup (returnflag → linestatus → grand total).
    "q_rollup" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy(col("rf").asc, col("ls").asc)
    }),

    // Full cube over the same dims.
    "q_cube" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("sum_price"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_price"))
        .orderBy(col("rf").asc, col("ls").asc)
    }),

    // Broadcast dim chain: orders ⋈ customer ⋈ nation (both dims
    // broadcast — no shuffle of the fact side at any scale).
    "q_join_dim" -> ((s, dir) => {
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum("o_totalprice"), 2).as("rev"), count(lit(1)).as("n_orders"))
        .orderBy(col("rev").desc_nulls_last, col("n_name").asc)
    }),

    // TPC-H Q5-shaped 6-table join: the one genuine big shuffle join
    // (orders ⋈ lineitem on orderkey); dims broadcast; AQE re-plans.
    "q_join_multi" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= to_timestamp_ntz(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp_ntz(lit("1998-01-01 00:00:00")))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev"),
          count(lit(1)).as("n"))
        .orderBy(col("rev").desc_nulls_last, col("n_name").asc)
    }),

    // Left-semi: customers holding at least one jumbo order (EXISTS).
    "q_semi_join" -> ((s, dir) => {
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 450000.0)
      Tables.customer(s, dir)
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy(col("c_custkey").asc)
    }),

    // Left-anti: customers with NO order above the threshold (NOT EXISTS).
    "q_anti_join" -> ((s, dir) => {
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000.0)
      Tables.customer(s, dir)
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy(col("c_custkey").asc)
    }),

    // Analytic windows: lag / lead / 3-row moving average / running sum
    // per key in time order (the moving-average extension of SURVEY §2.5).
    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, dir).select(
          col("user_id"), col("event_id"), col("ts"), col("value"),
          lag("value", 1).over(w).as("prev_value"),
          lead("value", 1).over(w).as("next_value"),
          round(avg("value").over(w.rowsBetween(-2, 0)), 4).as("mavg3"),
          round(sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).as("running_sum"))
        .orderBy(col("user_id").asc, col("ts").asc, col("event_id").asc)
    }),

    // Ranking windows: row_number / rank / dense_rank / ntile within group.
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, dir).select(
          col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy(col("c_mktsegment").asc, col("rn").asc)
    }),

    // Top-N per group (top-3 orders per priority class).
    "q_topn_per_group" -> ((s, dir) => {
      TopK.topNPerGroup(Tables.orders(s, dir), Seq("o_orderpriority"), 3,
          col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderpriority", "rn_in_group", "o_orderkey", "o_totalprice")
        .orderBy(col("o_orderpriority").asc, col("rn_in_group").asc)
    }),

    // As-of join: per-user latest value as of weekly probe timestamps —
    // single co-partitioned sort, no per-probe scan (graft.ops.Latest).
    "q_asof" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val probeTs = Seq("2024-01-07", "2024-01-14", "2024-01-21", "2024-01-28")
      val probes = e.select(col("user_id")).distinct()
        .crossJoin(s.range(1).select(
          explode(array(probeTs.map(d => to_timestamp_ntz(lit(d))): _*)).as("probe_ts")))
      Latest.asOfJoin(e, probes, "user_id", "ts", "probe_ts", "value", "event_id")
        .orderBy(col("user_id").asc, col("probe_ts").asc)
    }),

    // The same as-of lookup through the native whole-plan operator
    // (graft.plans.AsofJoinExec: co-partitioned single-pass merge) —
    // same oracle, so the driver pins the custom exec to the union+window
    // form row-for-row.
    "q_asof_native" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val probeTs = Seq("2024-01-07", "2024-01-14", "2024-01-21", "2024-01-28")
      val probes = e.select(col("user_id")).distinct()
        .crossJoin(s.range(1).select(
          explode(array(probeTs.map(d => to_timestamp_ntz(lit(d))): _*)).as("probe_ts")))
      Latest.asOfJoinNative(e, probes, "user_id", "ts", "probe_ts", "value", "event_id")
        .orderBy(col("user_id").asc, col("probe_ts").asc)
    }))

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_stats" ->
      """SELECT event_type, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users,
        |  min(value) AS min_value, max(value) AS max_value,
        |  round(avg(value), 4) AS avg_value,
        |  round(sum(value), 2) AS sum_value,
        |  round(stddev_samp(value), 4) AS sd_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "q_join_dim" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS rev, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY rev DESC NULLS LAST, n_name""".stripMargin,

    "q_join_multi" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev,
        |  count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY r_name, n_name ORDER BY rev DESC NULLS LAST, n_name""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_window_lag" ->
      """SELECT user_id, event_id, ts, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  round(avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg3,
        |  round(sum(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, ts, event_id""".stripMargin,

    "q_window_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  CAST(row_number() OVER w AS INTEGER) AS rn,
        |  CAST(rank() OVER w AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, rn""".stripMargin,

    "q_topn_per_group" ->
      """SELECT o_orderpriority, rn_in_group, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn_in_group
        |  FROM orders)
        |WHERE rn_in_group <= 3
        |ORDER BY o_orderpriority, rn_in_group""".stripMargin,

    "q_asof" ->
      """WITH probes AS (
        |  SELECT user_id, probe_ts
        |  FROM (SELECT DISTINCT user_id FROM events)
        |  CROSS JOIN (VALUES (TIMESTAMP '2024-01-07'), (TIMESTAMP '2024-01-14'),
        |    (TIMESTAMP '2024-01-21'), (TIMESTAMP '2024-01-28')) p(probe_ts))
        |SELECT u.user_id, u.probe_ts,
        |  (SELECT e.value FROM events e
        |   WHERE e.user_id = u.user_id AND e.ts <= u.probe_ts
        |   ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS asof_value
        |FROM probes u ORDER BY user_id, probe_ts""".stripMargin,

    "q_asof_native" ->
      """WITH probes AS (
        |  SELECT user_id, probe_ts
        |  FROM (SELECT DISTINCT user_id FROM events)
        |  CROSS JOIN (VALUES (TIMESTAMP '2024-01-07'), (TIMESTAMP '2024-01-14'),
        |    (TIMESTAMP '2024-01-21'), (TIMESTAMP '2024-01-28')) p(probe_ts))
        |SELECT u.user_id, u.probe_ts,
        |  (SELECT e.value FROM events e
        |   WHERE e.user_id = u.user_id AND e.ts <= u.probe_ts
        |   ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS asof_value
        |FROM probes u ORDER BY user_id, probe_ts""".stripMargin)
}
