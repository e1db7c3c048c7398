package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifth relational-breadth wave: the distribution-rank window family
  * (ntile / percent_rank / cume_dist) and explicit-frame value windows
  * (first/last/nth). Ranks and distribution scores are exact integer
  * ratios — bit-identical across engines; every window totally orders
  * its partition (tiebreak on the unique id) so frames are reproducible.
  */
object Breadth5 {

  val defs: Map[String, Q] = Map(
    // Distribution ranks per event type: quartile bucket, percent rank,
    // cumulative distribution. percent_rank = (rank-1)/(n-1) and
    // cume_dist = preceding/n are integer-ratio doubles (no rounding
    // needed); the ordering is totally determined by (value, event_id).
    "q_window_dist" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").asc, col("event_id").asc)
      Tables.events(s, dir)
        .filter(col("event_id") < 1500)
        .select(col("event_id"), col("event_type"), col("value"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cum_dist"))
        .orderBy(col("event_id").asc)
    }),

    // Explicit-frame value windows per user (time-ordered, id tiebreak):
    // the session's first value, the running last (default frame —
    // unbounded preceding to current row), and the partition-wide second
    // value via an explicit full frame. Frames are spelled out because
    // last_value over the DEFAULT frame is the classic silent-wrong-
    // answer trap — pinned here with both engines agreeing.
    "q_window_firstlast" -> ((s, dir) => {
      val ordered = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val full = ordered.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, dir)
        .filter(col("event_id") < 1500)
        .select(col("event_id"), col("user_id"), col("value"),
          first(col("value")).over(running).as("first_v"),
          last(col("value")).over(running).as("running_last_v"),
          nth_value(col("value"), 2).over(full).as("second_v"))
        .orderBy(col("event_id").asc)
    }),

    // Salted two-phase aggregation — the hot-key mitigation, in the
    // oracle-checked set: phase 1 shards each key across salt buckets so
    // a dominant key spreads over 8 tasks instead of one straggler,
    // phase 2 merges the algebraic partials. The oracle states the plain
    // single-phase aggregate: identical results IS the contract (sums
    // here are 2-dp inputs rounded after the merge, per the parity
    // rules).
    "q_salted_agg" -> ((s, dir) => {
      graft.ops.Skew.saltedSumCount(Tables.events(s, dir),
          "event_type", "value", "event_id", saltBuckets = 8)
        .select(col("event_type"), col("n"),
          round(col("sum_value"), 2).as("sum_value"))
        .orderBy(col("event_type").asc)
    }),

    // Bag-semantics set ops: INTERSECT ALL / EXCEPT ALL over per-event
    // (user, day) multisets — multiplicity preserved, which the DISTINCT
    // set ops of q_set_ops deliberately discard. Catalyst plans both as
    // aggregates over a replicated count column, not a row-by-row scan.
    "q_set_ops_all" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      def side(t: String) = e.filter(col("event_type") === t)
        .select(col("user_id"), col("ts").cast("date").as("day"))
      val rows = Seq(
        ("intersect_all", side("purchase").intersectAll(side("click"))),
        ("except_all", side("purchase").exceptAll(side("click"))))
      rows.map { case (op, df) =>
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      }.reduce(_ unionByName _).orderBy(col("op").asc)
    }),

    // LATERAL correlated subquery through the SQL frontend: each
    // customer's top-2 orders by price. Catalyst DECORRELATES the lateral
    // into a ranked window join — the plan to check; a per-row re-scan of
    // orders would be quadratic at scale.
    "q_lateral_topn" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_lv")
      Tables.orders(s, dir).createOrReplaceTempView("orders_lv")
      s.sql(
        """SELECT c_custkey, o_orderkey, o_totalprice
          |FROM customer_lv,
          |LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders_lv
          |  WHERE o_custkey = c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2)
          |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
    }),

    // Recursive CTE (Spark 4 UnionLoop): generate a contiguous day spine
    // and gap-fill daily event counts — the time-series continuity fix
    // for dashboards that must show zero-activity days. The recursion
    // materializes |days| rows (bounded, driver-independent); the event
    // aggregation stays a partial+final count and joins the tiny spine.
    "q_recursive_days" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_rv")
      s.sql(
        """WITH RECURSIVE days(d) AS (
          |  SELECT DATE'2024-01-01'
          |  UNION ALL SELECT date_add(d, 1) FROM days WHERE d < DATE'2024-02-10'
          |)
          |SELECT d AS day, coalesce(n, 0L) AS n_events
          |FROM days LEFT JOIN (
          |  SELECT CAST(ts AS DATE) AS ed, count(*) AS n
          |  FROM events_rv GROUP BY CAST(ts AS DATE)) e
          |ON d = ed ORDER BY day""".stripMargin)
    }),

    // grouping_id over a cube: the bitmask that tells subtotal rows apart
    // from genuine NULL group keys — the disambiguation q_cube's
    // coalesce('ALL') trick cannot provide when a key can itself be null.
    "q_grouping_id" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("-")).as("rf"),
          coalesce(col("l_linestatus"), lit("-")).as("ls"),
          col("gid").cast("int").as("gid"), col("n"))
        .orderBy(col("gid").asc, col("rf").asc, col("ls").asc)
    }),

    // Null-safe equality join (<=>): rows pair when keys are equal OR
    // both null — the semantics a plain equi-join silently drops. Nulls
    // are injected deterministically on both sides; the oracle uses IS
    // NOT DISTINCT FROM. NOTE the scale caveat: null-safe joins hash the
    // null bucket like any key, so a null-heavy corpus skews one
    // partition — the mitigation (filter-nulls + union) is what q_skew's
    // salting demonstrates; here nulls are a bounded minority.
    "q_nullsafe_join" -> ((s, dir) => {
      val e = Tables.events(s, dir).filter(col("event_id") < 500)
        .select(col("event_id"),
          when(pmod(col("user_id"), lit(10)) === 0, lit(null).cast("long"))
            .otherwise(col("user_id")).as("uid"))
      val u = Tables.events(s, dir).filter(col("event_id") < 500)
        .groupBy(when(pmod(col("user_id"), lit(10)) === 0, lit(null).cast("long"))
          .otherwise(col("user_id")).as("uid"))
        .agg(count(lit(1)).as("n_events"))
      e.join(u, e("uid") <=> u("uid"))
        .select(col("event_id"), e("uid").as("uid"), col("n_events"))
        .orderBy(col("event_id").asc)
    }),

    // Array higher-order functions over embeddings: filter / exists /
    // aggregate / transform — per-row lambda pipelines that stay inside
    // codegen (no UDF, no explode): positive-component count, any-above-
    // threshold flag, and the sequential-fold sum of squares (identical
    // fold order to DuckDB's list functions, so doubles match raw).
    "q_array_funcs" -> ((s, dir) => {
      val v = col("embedding")
      Tables.embeddings(s, dir).select(
          col("vec_id"),
          size(v).as("dim"),
          size(filter(v, x => x > 0.0f)).as("n_pos"),
          exists(v, x => x > lit(2.0f)).as("has_large"),
          round(aggregate(v, lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double")), 4).as("sum_sq"))
        .orderBy(col("vec_id").asc)
    }),

    // UNPIVOT (melt): wide per-row measures → long (metric, value) rows,
    // then a per-metric profile — the normalization step before generic
    // per-metric aggregation. Spark's unpivot is a local generator (no
    // shuffle until the aggregate); the oracle states the UNION ALL
    // equivalent, which is exactly unpivot's semantics.
    "q_unpivot" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_quantity").cast("double").as("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_tax")),
          "metric", "val")
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("n"), round(sum("val"), 2).as("total"))
        .orderBy(col("metric").asc)
    }))

  val oracle: Map[String, String] = Map(
    "q_window_dist" ->
      """SELECT event_id, event_type, value,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cum_dist
        |FROM events WHERE event_id < 1500
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin,

    "q_window_firstlast" ->
      """SELECT event_id, user_id, value,
        |  first_value(value) OVER running AS first_v,
        |  last_value(value) OVER running AS running_last_v,
        |  nth_value(value, 2) OVER wfull AS second_v
        |FROM events WHERE event_id < 1500
        |WINDOW
        |  running AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wfull AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,

    "q_grouping_id" ->
      """SELECT coalesce(l_returnflag, '-') AS rf,
        |  coalesce(l_linestatus, '-') AS ls,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
        |  count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, rf, ls""".stripMargin,

    "q_nullsafe_join" ->
      """WITH e AS (
        |  SELECT event_id,
        |    CASE WHEN user_id % 10 = 0 THEN NULL ELSE user_id END AS uid
        |  FROM events WHERE event_id < 500),
        |u AS (
        |  SELECT CASE WHEN user_id % 10 = 0 THEN NULL ELSE user_id END AS uid,
        |    count(*) AS n_events
        |  FROM events WHERE event_id < 500 GROUP BY 1)
        |SELECT event_id, e.uid, n_events
        |FROM e JOIN u ON e.uid IS NOT DISTINCT FROM u.uid
        |ORDER BY event_id""".stripMargin,

    "q_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
        |  len(list_filter(embedding, x -> x > 2.0)) > 0 AS has_large,
        |  round(list_dot_product(CAST(embedding AS DOUBLE[]),
        |    CAST(embedding AS DOUBLE[])), 4) AS sum_sq
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_salted_agg" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_set_ops_all" ->
      """WITH p AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events
        |  WHERE event_type = 'click')
        |SELECT 'except_all' AS op, count(*) AS n
        |  FROM (SELECT * FROM p EXCEPT ALL SELECT * FROM c)
        |UNION ALL
        |SELECT 'intersect_all', count(*)
        |  FROM (SELECT * FROM p INTERSECT ALL SELECT * FROM c)
        |ORDER BY op""".stripMargin,

    "q_lateral_topn" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) t
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,

    "q_recursive_days" ->
      """WITH RECURSIVE days(d) AS (
        |  SELECT DATE '2024-01-01'
        |  UNION ALL SELECT d + 1 FROM days WHERE d < DATE '2024-02-10')
        |SELECT d AS day, coalesce(n, 0) AS n_events
        |FROM days LEFT JOIN (
        |  SELECT CAST(ts AS DATE) AS ed, count(*) AS n
        |  FROM events GROUP BY CAST(ts AS DATE)) e
        |ON d = ed ORDER BY day""".stripMargin,

    "q_unpivot" ->
      """WITH melted AS (
        |  SELECT l_orderkey, 'l_quantity' AS metric,
        |    CAST(l_quantity AS DOUBLE) AS val FROM lineitem
        |  UNION ALL SELECT l_orderkey, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT l_orderkey, 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT l_orderkey, 'l_tax', l_tax FROM lineitem)
        |SELECT metric, count(*) AS n, round(sum(val), 2) AS total
        |FROM melted GROUP BY metric ORDER BY metric""".stripMargin)
}
