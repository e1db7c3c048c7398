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

    "q_null_order" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |FROM events WHERE event_id < 500
        |ORDER BY v ASC NULLS FIRST, event_id""".stripMargin)
}
