package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixty-second wave — concentration and impact curves.
  *
  *  - **q_pareto_curve**: the Lorenz/Pareto revenue-concentration
  *    curve — customers rank-bucketed into revenue deciles (cent-
  *    quantized sums, the RFM discipline), each decile's revenue
  *    share and the cumulative share from the top. The "is it 80/20"
  *    curve behind q_gini's scalar; the cumulative sum runs over the
  *    10-row decile aggregate (integer cumsum, then one division
  *    each).
  *  - **q_impact_curve**: price impact vs trade size — ticks bucketed
  *    by FIXED-WIDTH volume bands (v div 10 — map-only, no global
  *    rank), per band the tick count, total |Δprice| and mean |move|
  *    as a ratio of integer sums. The empirical curve behind the
  *    q_kyle_lambda regression coefficient: impact should rise with
  *    size band if lambda is real.
  *
  * Scale shape: one groupBy each over exact integers; the only
  * windows are per-key tick lags and the ≤10-row decile cumsum. */
object Breadth61 {

  private[graft] val ParetoDeciles = 10
  private[graft] val ImpactBand = 10L

  private[graft] def paretoCurve(orders: DataFrame): DataFrame = {
    val per = orders
      .withColumn("__cents",
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("__cents")).as("__rev"))
    val n = Window.partitionBy()
    val byRev = Window.orderBy(col("__rev").desc, col("o_custkey").asc)
    val dec = per
      .withColumn("__n", count(lit(1)).over(n))
      .withColumn("__rk", row_number().over(byRev).cast("long"))
      .withColumn("decile",
        expr(s"($ParetoDeciles * (__rk - 1)) div __n").cast("int"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("__rev")).as("revenue_cents"))
    val cum = Window.orderBy(col("decile").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy()
    dec
      .withColumn("__cum", sum(col("revenue_cents")).over(cum))
      .withColumn("__tot", sum(col("revenue_cents")).over(tot))
      .select(col("decile"), col("n_customers"), col("revenue_cents"),
        (col("revenue_cents").cast("double") / col("__tot").cast("double"))
          .as("rev_share"),
        (col("__cum").cast("double") / col("__tot").cast("double"))
          .as("cum_share"))
      .orderBy(col("decile").asc)
  }

  private[graft] def impactCurve(df: DataFrame, keyCol: String,
                                 tsCol: String, valCol: String,
                                 tieBreak: String,
                                 qtyJsonField: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    df
      .withColumn("__c", floor(col(valCol) * lit(100.0) + lit(0.5))
        .cast("long"))
      .withColumn("__v", coalesce(
        get_json_object(col("props"), s"$$.$qtyJsonField").cast("long"),
        lit(0L)))
      .withColumn("__pc", lag(col("__c"), 1).over(byKey))
      .filter(col("__pc").isNotNull)
      .withColumn("band", expr(s"__v div $ImpactBand").cast("int"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_ticks"),
        sum(abs(col("__c") - col("__pc"))).as("total_abs_move_cents"))
      .select(col("band"), col("n_ticks"), col("total_abs_move_cents"),
        (col("total_abs_move_cents").cast("double") /
          (col("n_ticks") * lit(100L)).cast("double")).as("mean_abs_move"))
      .orderBy(col("band").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_pareto_curve" -> ((s, dir) => paretoCurve(Tables.orders(s, dir))),
    "q_impact_curve" -> ((s, dir) =>
      impactCurve(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id", "k")))

  val oracle: Map[String, String] = Map(
    "q_pareto_curve" ->
      s"""WITH per AS (
         |  SELECT o_custkey,
         |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS rev
         |  FROM orders GROUP BY o_custkey),
         |rk AS (
         |  SELECT *,
         |    CAST(count(*) OVER () AS BIGINT) AS n,
         |    CAST(row_number() OVER (ORDER BY rev DESC, o_custkey)
         |      AS BIGINT) AS r
         |  FROM per),
         |dec AS (
         |  SELECT CAST(($ParetoDeciles * (r - 1)) // n AS INTEGER) AS decile,
         |    CAST(count(*) AS BIGINT) AS n_customers,
         |    CAST(sum(rev) AS BIGINT) AS revenue_cents
         |  FROM rk GROUP BY 1)
         |SELECT decile, n_customers, revenue_cents,
         |  CAST(revenue_cents AS DOUBLE)
         |    / CAST(sum(revenue_cents) OVER () AS DOUBLE) AS rev_share,
         |  CAST(sum(revenue_cents) OVER (ORDER BY decile
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         |    / CAST(sum(revenue_cents) OVER () AS DOUBLE) AS cum_share
         |FROM dec ORDER BY decile""".stripMargin,

    "q_impact_curve" ->
      s"""WITH t AS (
         |  SELECT user_id, ts, event_id,
         |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
         |    coalesce(CAST(json_extract_string(props, '$$.k') AS BIGINT), 0)
         |      AS v
         |  FROM events),
         |lg AS (
         |  SELECT user_id, c, v,
         |    lag(c) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pc
         |  FROM t)
         |SELECT CAST(v // $ImpactBand AS INTEGER) AS band,
         |  CAST(count(*) AS BIGINT) AS n_ticks,
         |  CAST(sum(abs(c - pc)) AS BIGINT) AS total_abs_move_cents,
         |  CAST(sum(abs(c - pc)) AS DOUBLE)
         |    / CAST(count(*) * 100 AS DOUBLE) AS mean_abs_move
         |FROM lg WHERE pc IS NOT NULL
         |GROUP BY 1 ORDER BY band""".stripMargin)
}
