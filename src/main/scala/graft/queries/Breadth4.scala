package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Fourth wave: outer-join family and explicit null-ordering — the
  * remaining relational surface rows. */
object Breadth4 {

  val defs: Map[String, Q] = Map(
    // LEFT OUTER with null-side handling: every customer, their count of
    // jumbo orders (0 when none — coalesce over the null side).
    "q_left_join" -> ((s, dir) => {
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 450000.0)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
      Tables.customer(s, dir)
        .join(big, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(col("c_custkey"), coalesce(col("n_big"), lit(0L)).as("n_big"))
        .orderBy(col("c_custkey").asc)
    }),

    // FULL OUTER across two aggregated sides: per-user purchase totals vs
    // click totals — users may exist on either side only.
    "q_full_outer" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      def side(t: String, name: String) =
        e.filter(col("event_type") === t).groupBy(col("user_id"))
          .agg(round(sum("value"), 2).as(name))
      val p = side("purchase", "purchase_total")
        .select(col("user_id").as("pu"), col("purchase_total"))
      val c = side("click", "click_total")
        .select(col("user_id").as("cu"), col("click_total"))
      p.join(c, col("pu") === col("cu"), "full_outer")
        .select(coalesce(col("pu"), col("cu")).as("user_id"),
          col("purchase_total"), col("click_total"))
        .orderBy(col("user_id").asc)
    }),

    // Weighted mean of value by the JSON prop k, per event type. The hot
    // path is the built-in sum(v*w)/sum(w) — a DeclarativeAggregate that
    // stays inside whole-stage codegen. The typed Aggregator surface
    // (graft.functions.WeightedMean via udaf()) computes the identical
    // fold but pays an encoder round-trip per row in ObjectHashAggregate
    // (measured 4× this query at sf0.1); it remains the UDAF coverage
    // demo, pinned equal to this form in QueriesSpec.
    "q_typed_agg" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_type"), col("value"),
          get_json_object(col("props"), "$.k").cast("double").as("w"))
        // rows without a numeric $.k are excluded explicitly (the oracle
        // filters identically)
        .filter(col("w").isNotNull)
        .groupBy(col("event_type"))
        .agg(round(sum(col("value") * col("w")) / sum(col("w")), 4).as("wmean"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type").asc)
    }),

    // Correlated scalar subquery through the SQL frontend (Catalyst
    // decorrelates it into a join — the plan to check, not a per-row
    // re-scan).
    "q_scalar_subquery" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c_custkey,
          |  (SELECT round(max(o_totalprice), 2) FROM orders_v
          |   WHERE o_custkey = c_custkey) AS max_order
          |FROM customer_v ORDER BY c_custkey""".stripMargin)
    }),

    // Generator as query surface: explode the token stream, aggregate
    // term frequencies (top-20, fully tie-broken).
    "q_token_freq" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(explode(graft.text.Text.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok").asc)
        .limit(20)
    }),

    // Explicit null ordering: nulls injected deterministically, sorted
    // NULLS FIRST on one key and NULLS LAST on the tiebreak output —
    // Spark and PG/DuckDB defaults differ, so this is pinned explicitly
    // everywhere (SURVEY §7.4.2).
    "q_null_order" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(col("event_id") < 500)
        .select(col("event_id"),
          when(col("event_type") === "error", lit(null).cast("double"))
            .otherwise(col("value")).as("v"))
        .orderBy(col("v").asc_nulls_first, col("event_id").asc)
    }))

  val oracle: Map[String, String] = Map(
    "q_left_join" ->
      """SELECT c_custkey, coalesce(n_big, 0) AS n_big
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, count(*) AS n_big FROM orders
        |  WHERE o_totalprice > 450000.0 GROUP BY o_custkey) b
        |ON c_custkey = b.o_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q_full_outer" ->
      """SELECT coalesce(p.user_id, c.user_id) AS user_id,
        |  p.purchase_total, c.click_total
        |FROM (SELECT user_id, round(sum(value), 2) AS purchase_total
        |      FROM events WHERE event_type = 'purchase' GROUP BY user_id) p
        |FULL OUTER JOIN
        |     (SELECT user_id, round(sum(value), 2) AS click_total
        |      FROM events WHERE event_type = 'click' GROUP BY user_id) c
        |ON p.user_id = c.user_id
        |ORDER BY user_id""".stripMargin,

    "q_typed_agg" ->
      """SELECT event_type,
        |  round(sum(value * CAST(json_extract_string(props, '$.k') AS DOUBLE))
        |    / sum(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS wmean,
        |  count(*) AS n
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT c_custkey,
        |  (SELECT round(max(o_totalprice), 2) FROM orders
        |   WHERE o_custkey = c_custkey) AS max_order
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_token_freq" ->
      """SELECT tok, count(*) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
        |  FROM documents)
        |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin,

    "q_null_order" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |FROM events WHERE event_id < 500
        |ORDER BY v ASC NULLS FIRST, event_id""".stripMargin)
}
