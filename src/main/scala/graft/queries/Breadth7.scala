package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventh relational wave — the user-analytics and table-maintenance
  * patterns layered on the event log:
  *
  *  - CDC MERGE/upsert apply (one full-outer join, no per-key RPC — the
  *    batch form of the reference ETL's `ON CONFLICT DO UPDATE`);
  *  - cohort retention (first-seen week × activity-week offset), all
  *    date math in the integer day domain so both engines agree on week
  *    boundaries by construction;
  *  - ordered-step funnel (view → click after it → purchase after that),
  *    three stacked full-partition window minima sharing ONE shuffle;
  *  - bucketed-store join: both sides pre-bucketed on the join key →
  *    sort-merge join with NO exchange on either input (pinned in
  *    PlanSpec) — the co-located-join layout a 100 TB warehouse
  *    maintains so its hot join never shuffles the fact table.
  */
object Breadth7 {

  /** Change-feed split: event_id ≡ 0 (mod 3) rows are the CDC feed, the
    * rest are the history the base snapshot folds. Deterministic and
    * non-degenerate at every SF (event_id is dense from 0). */
  private val FeedMod = 3

  val defs: Map[String, Q] = Map(
    // CDC MERGE: base = latest state per user from the base feed;
    // changes = last-wins row per user from the change feed, with
    // `error` events acting as tombstones (account closed). One
    // full-outer join applies the whole feed; `status` is the merge
    // provenance ledger. The last-wins dedups share one window shape
    // (same partition key, same order) — each feed sorts once.
    "q_merge_upsert" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      val wLast = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      def lastPerUser(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("__rn", row_number().over(wLast))
          .filter(col("__rn") === 1).drop("__rn")
      val base = lastPerUser(e.filter(pmod(col("event_id"), lit(FeedMod)) =!= 0))
        .select(col("user_id"), col("value"), col("ts"))
      val changes = lastPerUser(e.filter(pmod(col("event_id"), lit(FeedMod)) === 0))
        .select(col("user_id"), col("value"), col("ts"),
          (col("event_type") === "error").as("__del"))
      graft.ops.Merge.mergeInto(base, changes, "user_id", "__del")
        .orderBy(col("user_id").asc)
    }),

    // Cohort retention: cohort = the user's first-seen week, activity =
    // distinct users per (cohort_week, weeks-since-cohort). The cohort
    // anchor is a full-partition window min (no self-join); ALL week
    // arithmetic is integer division of day counts (`div 7`), so week
    // bucketing is engine-independent by construction — `date_trunc
    // ('week')` would hang the result on each engine's week-start
    // convention.
    "q_cohort_retention" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("day"))
        .withColumn("d0", min(col("day")).over(w))
        .select(col("user_id"),
          expr("datediff(d0, DATE'1970-01-01') div 7").as("cohort_week"),
          expr("datediff(day, d0) div 7").as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week").asc, col("week_offset").asc)
    }),

    // Ordered-step funnel: a user converts step k only with an event
    // STRICTLY AFTER their step-(k−1) time — three stacked
    // full-partition window minima, each conditioned on the previous
    // stage. All three Window nodes share the user_id partitioning: ONE
    // shuffle, then per-partition passes. (The naive per-step self-join
    // cascade is 3 shuffled joins of the full log.)
    "q_funnel" -> ((s, dir) =>
      graft.ops.Funnel.conversion(
        Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts")),
        "user_id", "event_type", "ts",
        steps = Seq("view", "click", "purchase"),
        stepNames = Seq("n_view", "n_view_click", "n_full_funnel"))),

    // Bucketed co-located join: orders and customer both live in stores
    // bucketed INTO 8 BUCKETS on the join key, so the sort-merge join
    // reads co-located buckets directly — NO Exchange on either join
    // input (PlanSpec pins exactly one Exchange in the whole plan: the
    // post-join re-key for the segment aggregate). The `merge` hints pin
    // SMJ so the plan exercises the bucket layout rather than
    // broadcasting the small test-scale dim.
    // Z-order clustering ledger: rows map to the Morton interleave of
    // two key dimensions (native codegen expression `graft_zvalue`),
    // bucket by z-range — exactly what a re-cluster job sorts on — and
    // report each bucket's min/max of BOTH dimensions. The point the
    // output makes: every z-bucket bounds x AND y simultaneously, so
    // file-level min/max statistics prune on EITHER column's predicate
    // (clustering on one column alone leaves the other's bounds spanning
    // the domain). The oracle recomputes the interleave arithmetically
    // (bit-sum form), pinning the expression's bit layout.
    "q_zorder" -> ((s, dir) => {
      import org.apache.spark.sql.graft.Bridge
      val z = Bridge.column(graft.functions.ZValue(
        Bridge.expression(col("x")), Bridge.expression(col("y"))))
      Tables.part(s, dir)
        .select(col("p_size").cast("long").as("x"),
          pmod(col("p_partkey"), lit(256L)).as("y"))
        .withColumn("z", z)
        .withColumn("z_bucket", expr("z div 4096"))
        .groupBy(col("z_bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy(col("z_bucket").asc)
    }),

    "q_bucketed_join" -> ((s, dir) => {
      val o = s.table(Stores.bucketedOrders(s, dir))
      val c = s.table(Stores.bucketedCustomer(s, dir))
      o.hint("merge")
        .join(c.hint("merge"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy(col("c_mktsegment").asc)
    }))

  val oracle: Map[String, String] = Map(
    "q_merge_upsert" ->
      s"""WITH ranked AS (
         |  SELECT user_id, value, ts, event_type,
         |    event_id % $FeedMod = 0 AS is_ch,
         |    row_number() OVER (PARTITION BY user_id, event_id % $FeedMod = 0
         |      ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM events),
         |base AS (
         |  SELECT user_id, value, ts FROM ranked WHERE NOT is_ch AND rn = 1),
         |ch AS (
         |  SELECT user_id, value, ts, event_type = 'error' AS del
         |  FROM ranked WHERE is_ch AND rn = 1)
         |SELECT coalesce(b.user_id, c.user_id) AS user_id,
         |  CASE WHEN c.user_id IS NOT NULL THEN c.value ELSE b.value END AS value,
         |  CASE WHEN c.user_id IS NOT NULL THEN c.ts ELSE b.ts END AS ts,
         |  CASE WHEN b.user_id IS NULL THEN 'inserted'
         |       WHEN c.user_id IS NULL THEN 'kept'
         |       ELSE 'updated' END AS status
         |FROM base b FULL OUTER JOIN ch c ON b.user_id = c.user_id
         |WHERE NOT coalesce(c.del, false)
         |ORDER BY 1""".stripMargin,

    "q_cohort_retention" ->
      """WITH d AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (
        |  SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS d0
        |  FROM d)
        |SELECT CAST((d0 - DATE '1970-01-01') // 7 AS BIGINT) AS cohort_week,
        |  CAST((day - d0) // 7 AS BIGINT) AS week_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
        |    OVER (PARTITION BY user_id) AS t2
        |  FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
        |    OVER (PARTITION BY user_id) AS t3
        |  FROM s2)
        |SELECT count(DISTINCT user_id) AS n_users,
        |  count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS n_view,
        |  count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS n_view_click,
        |  count(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS n_full_funnel
        |FROM s3""".stripMargin,

    // The interleave restated as arithmetic: bit i of x lands on z bit
    // 2i, bit i of y on 2i+1 (8 bits each suffice: x = p_size <= 50,
    // y < 256 by construction).
    "q_zorder" -> {
      val zSum = (0 until 8).map(i =>
        s"((x // ${1L << i}) % 2) * ${1L << (2 * i)} + " +
          s"((y // ${1L << i}) % 2) * ${1L << (2 * i + 1)}").mkString(" + ")
      s"""WITH b AS (
         |  SELECT CAST(p_size AS BIGINT) AS x,
         |    CAST(p_partkey % 256 AS BIGINT) AS y
         |  FROM part),
         |z AS (SELECT x, y, $zSum AS z FROM b)
         |SELECT CAST(z // 4096 AS BIGINT) AS z_bucket, count(*) AS n,
         |  min(x) AS min_x, max(x) AS max_x,
         |  min(y) AS min_y, max(y) AS max_y
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // The oracle is the plain logical join — the bucket layout must be
    // invisible in the result.
    "q_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
