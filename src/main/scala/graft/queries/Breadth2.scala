package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Second breadth wave: set operations, pivot, ordered collection aggs,
  * arg-min/max, percentiles, correlation, string-function bundle, and a
  * sketch aggregate. Same determinism discipline as Breadth.
  */
object Breadth2 {

  val defs: Map[String, Q] = Map(
    // UNION / INTERSECT / EXCEPT over distinct key sets.
    "q_set_ops" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val buyers = e.filter(col("event_type") === "purchase")
        .select("user_id").distinct()
      val clickers = e.filter(col("event_type") === "click")
        .select("user_id").distinct()
      val rows = Seq(
        ("union", buyers.union(clickers).distinct()),
        ("intersect", buyers.intersect(clickers)),
        ("except", buyers.except(clickers)))
      rows.map { case (op, df) =>
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      }.reduce(_ unionByName _).orderBy(col("op").asc)
    }),

    // Pivot: event_type → columns (explicit value list pins the schema —
    // at scale an implicit pivot means an extra distinct-scan job).
    "q_pivot" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(sum("value"), 2))
        .orderBy(col("user_id").asc)
    }),

    // Ordered collection agg, serialized to a scalar string (array-typed
    // result columns are avoided in oracle-checked outputs).
    "q_collect" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(concat_ws(",", sort_array(collect_set(col("event_type")))).as("types"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id").asc)
    }),

    // arg-min/arg-max: id of the first/last event per type (ts is unique
    // in the data → deterministic).
    "q_minmax_by" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(min_by(col("event_id"), col("ts")).as("first_event"),
          max_by(col("event_id"), col("ts")).as("last_event"),
          min("ts").as("first_ts"), max("ts").as("last_ts"))
        .orderBy(col("event_type").asc)
    }),

    // Exact interpolated percentiles (sort-based; identical interpolation
    // formula to quantile_cont).
    "q_percentiles" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          round(expr("percentile(value, 0.99)"), 4).as("p99"))
        .orderBy(col("event_type").asc)
    }),

    // Correlation / covariance between quantity and price.
    "q_corr" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qp_corr"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("qp_covar"))
        .orderBy(col("l_returnflag").asc)
    }),

    // String function bundle: substr / replace / pad / search / split_part.
    "q_string_funcs" -> ((s, dir) => {
      Tables.customer(s, dir).select(
          col("c_custkey"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          regexp_replace(col("c_name"), "Customer#0*", "C").as("short_name"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("key_padded"),
          instr(col("c_name"), "#").as("hash_pos"),
          split(col("c_name"), "#").getItem(1).as("key_digits"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("key_match"),
          length(col("c_name")).as("name_len"))
        .orderBy(col("c_custkey").asc)
    }),

    // Value-distribution histogram (fixed-width bins — the profiling op
    // a pipeline runs before choosing quality-filter thresholds).
    "q_histogram" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("bin", floor(col("value") / 25.0).cast("long"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("bin_avg"))
        .orderBy(col("bin").asc)
    }),

    // Column profile: nulls / distincts / bounds in one pass per table —
    // the schema-health check before any large ingest.
    "q_profile" -> ((s, dir) => {
      Tables.orders(s, dir).agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("o_custkey")).as("d_custkey"),
          countDistinct(col("o_orderstatus")).as("d_status"),
          sum(when(col("o_totalprice").isNull, 1).otherwise(0)).as("null_price"),
          round(min("o_totalprice"), 2).as("min_price"),
          round(max("o_totalprice"), 2).as("max_price"),
          min("o_orderdate").as("min_date"),
          max("o_orderdate").as("max_date"))
    }),

    // HLL sketch. The raw estimate is engine-specific (no DuckDB twin),
    // so the ORACLE-facing columns are the exact counts plus a boolean
    // error-bound assertion |approx−exact|/exact <= 5%. The sketch runs
    // at rsd 0.01, so the asserted 5% band is FIVE standard deviations —
    // rsd is a σ, not a hard bound, and asserting at 1σ flips on corpora
    // whose hashed set happens to land past it (found live: the default
    // 0.05-rsd sketch deviated >5% on sf0.1's 1500-user set, and since
    // every event_type shares that user set, all five groups flipped
    // together). Raw estimates are additionally pinned in SketchSpec.
    "q_approx_distinct" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          // exact = 0 would make the ratio null (non-ANSI x/0) and fail
          // the oracle's literal-true row; an all-null-users group is
          // "ok" iff the sketch also says 0
          when(col("exact_users") === 0, col("approx_users") === 0)
            .otherwise(abs(col("approx_users") - col("exact_users")).cast("double") /
              col("exact_users") <= 0.05).as("approx_ok"))
        .orderBy(col("event_type").asc)
    }))

  val oracle: Map[String, String] = Map(
    "q_set_ops" ->
      """WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
        |clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
        |SELECT 'except' AS op, count(*) AS n
        |  FROM (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM clickers)
        |UNION ALL
        |SELECT 'intersect', count(*)
        |  FROM (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM clickers)
        |UNION ALL
        |SELECT 'union', count(*)
        |  FROM (SELECT user_id FROM buyers UNION SELECT user_id FROM clickers)
        |ORDER BY op""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
        |  round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS error,
        |  round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
        |  round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
        |  round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_collect" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
        |  count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_minmax_by" ->
      """SELECT event_type,
        |  arg_min(event_id, ts) AS first_event,
        |  arg_max(event_id, ts) AS last_event,
        |  min(ts) AS first_ts, max(ts) AS last_ts
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_corr" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS qp_corr,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS qp_covar
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_string_funcs" ->
      """SELECT c_custkey,
        |  substr(c_name, 1, 8) AS name_prefix,
        |  regexp_replace(c_name, 'Customer#0*', 'C') AS short_name,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
        |  CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos,
        |  split_part(c_name, '#', 2) AS key_digits,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS key_match,
        |  CAST(length(c_name) AS INTEGER) AS name_len
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin,
        |  count(*) AS n, round(avg(value), 4) AS bin_avg
        |FROM events GROUP BY 1 ORDER BY bin""".stripMargin,

    "q_profile" ->
      """SELECT count(*) AS n_rows,
        |  count(DISTINCT o_custkey) AS d_custkey,
        |  count(DISTINCT o_orderstatus) AS d_status,
        |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_price,
        |  round(min(o_totalprice), 2) AS min_price,
        |  round(max(o_totalprice), 2) AS max_price,
        |  min(o_orderdate) AS min_date, max(o_orderdate) AS max_date
        |FROM orders""".stripMargin,

    // the oracle asserts the error bound holds: exact counts + literal
    // true per group — a Spark estimate outside ±5% breaks the hash match
    "q_approx_distinct" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  CAST(1 AS BOOLEAN) AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
