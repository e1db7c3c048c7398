package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixty-fifth wave — price elasticity, cohort LTV, A/B lift.
  *
  *  - **q_elasticity**: per-part price elasticity of demand — OLS
  *    slope of ln(quantity) on ln(unit price) over the part's line
  *    items (unit price = extendedprice/quantity, the observed
  *    transaction price). The grouped sibling of q_zipf_slope's
  *    global fit, same integer discipline: 1e-6-quantized ln values,
  *    five exact BIGINT sums per part (map-side combinable), one
  *    division. Parts with a degenerate design matrix (all unit
  *    prices equal → zero denominator) are dropped explicitly.
  *  - **q_cohort_ltv**: weekly-cohort lifetime value — users cohorted
  *    by the Monday week of their FIRST event, purchase revenue
  *    accumulated per cohort over week age, emitted as cumulative
  *    revenue per cohort user. The revenue twin of q_cohort_retention:
  *    date_trunc('week') is Monday-based in both engines, ages are
  *    exact day-diffs div 7, revenue is exact cents.
  *  - **q_ab_lift**: a two-proportion A/B test — users split by
  *    user_id parity (the deterministic assignment; q_hash_split owns
  *    the hashing variant), conversion = any purchase event, emitting
  *    both arms' rates, relative lift, and the pooled two-proportion
  *    z-statistic. Counts are exact integers; the z runs on identical
  *    doubles with sqrt (IEEE-exact) as the only non-arithmetic step.
  *
  * Scale shape: q_elasticity is one partkey groupBy (≈constant rows
  * per part at any SF); q_cohort_ltv shuffles once on user then once
  * on (cohort, age); q_ab_lift is one user groupBy + a global fold to
  * a single row. */
object Breadth64 {

  private[graft] val AbConvMin = 200.0

  /** Per-part OLS slope of ln(qty) on ln(unit price), quantized to
    * exact integers (1e-6) so every sum is shuffle-order-free. */
  private[graft] def elasticity(lineitem: DataFrame): DataFrame = {
    val q = lineitem
      .filter(col("l_quantity") > 0.0 && col("l_extendedprice") > 0.0)
      .select(col("l_partkey"),
        floor(log(col("l_extendedprice") / col("l_quantity")) *
          lit(1000000.0) + lit(0.5)).cast("long").as("x"),
        floor(log(col("l_quantity")) * lit(1000000.0) + lit(0.5))
          .cast("long").as("y"))
    val agg = q.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
        sum(col("x") * col("y")).as("__sxy"),
        sum(col("x") * col("x")).as("__sxx"))
    val num = col("n_obs") * col("__sxy") - col("__sx") * col("__sy")
    val den = col("n_obs") * col("__sxx") - col("__sx") * col("__sx")
    agg
      .filter(den =!= 0L)
      .select(col("l_partkey"), col("n_obs"),
        (num.cast("double") / den.cast("double")).as("elasticity"))
      .orderBy(col("l_partkey").asc)
  }

  /** Weekly-cohort cumulative revenue per cohort user. */
  private[graft] def cohortLtv(df: DataFrame, keyCol: String,
                               tsCol: String, typeCol: String,
                               valCol: String,
                               convType: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    val staged = df
      .withColumn("__cw",
        date_trunc("week", min(col(tsCol)).over(byKey)).cast("date"))
      .withColumn("__ew", date_trunc("week", col(tsCol)).cast("date"))
      .withColumn("__age", expr("datediff(__ew, __cw) div 7").cast("int"))
      .withColumn("__cents",
        when(col(typeCol) === convType,
          floor(col(valCol) * lit(100.0) + lit(0.5)).cast("long"))
          .otherwise(lit(0L)))
    val users = staged
      .groupBy(col("__cw").as("cohort_week"))
      .agg(countDistinct(col(keyCol)).as("n_users"))
    val rev = staged
      .groupBy(col("__cw").as("cohort_week"), col("__age").as("age_weeks"))
      .agg(sum(col("__cents")).as("__rev"))
    val cum = Window.partitionBy(col("cohort_week"))
      .orderBy(col("age_weeks").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev
      .join(broadcast(users), Seq("cohort_week"))
      .withColumn("cum_rev_cents", sum(col("__rev")).over(cum))
      .select(col("cohort_week"), col("age_weeks"), col("n_users"),
        col("cum_rev_cents"),
        (col("cum_rev_cents").cast("double") / lit(100.0) /
          col("n_users").cast("double")).as("ltv_per_user"))
      .orderBy(col("cohort_week").asc, col("age_weeks").asc)
  }

  /** Two-proportion A/B test on user-parity arms. Conversion = a
    * `convType` event above `minVal` (a bare any-purchase predicate
    * saturates both arms on this data — every user converts and the
    * z-statistic degenerates to 0/0); the degenerate pooled rates 0
    * and 1 still emit NULL z explicitly on both engines (Spark would
    * produce NaN, DuckDB the same — pinned as NULL rather than
    * trusting NaN-vs-NaN hash equality). */
  private[graft] def abLift(df: DataFrame, keyCol: String,
                            typeCol: String, convType: String,
                            minVal: Double): DataFrame = {
    val perUser = df
      .groupBy(col(keyCol))
      .agg(max(when(col(typeCol) === convType && col("value") > lit(minVal),
        1).otherwise(0)).as("__c"))
      .withColumn("__b", pmod(col(keyCol), lit(2)))
    val agg = perUser.agg(
      sum(when(col("__b") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__b") === 0, col("__c").cast("long"))
        .otherwise(0L)).as("conv_a"),
      sum(when(col("__b") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("__b") === 1, col("__c").cast("long"))
        .otherwise(0L)).as("conv_b"))
    val ra = col("conv_a").cast("double") / col("n_a").cast("double")
    val rb = col("conv_b").cast("double") / col("n_b").cast("double")
    val p = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    agg.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      ra.as("rate_a"), rb.as("rate_b"),
      when(col("conv_a") === 0L, lit(null).cast("double"))
        .otherwise(rb / ra - lit(1.0)).as("lift"),
      when(col("conv_a") + col("conv_b") === 0L ||
        col("conv_a") + col("conv_b") === col("n_a") + col("n_b"),
        lit(null).cast("double"))
        .otherwise((rb - ra) /
          sqrt(p * (lit(1.0) - p) *
            (lit(1.0) / col("n_a").cast("double") +
              lit(1.0) / col("n_b").cast("double")))).as("z"))
  }

  val defs: Map[String, Q] = Map(
    "q_elasticity" -> ((s, dir) => elasticity(Tables.lineitem(s, dir))),
    "q_cohort_ltv" -> ((s, dir) =>
      cohortLtv(Tables.events(s, dir), "user_id", "ts", "event_type",
        "value", "purchase")),
    "q_ab_lift" -> ((s, dir) =>
      abLift(Tables.events(s, dir), "user_id", "event_type", "purchase",
        AbConvMin)))

  val oracle: Map[String, String] = Map(
    "q_elasticity" ->
      """WITH q AS (
        |  SELECT l_partkey,
        |    CAST(floor(ln(l_extendedprice / l_quantity) * 1000000.0 + 0.5)
        |      AS BIGINT) AS x,
        |    CAST(floor(ln(l_quantity) * 1000000.0 + 0.5) AS BIGINT) AS y
        |  FROM lineitem WHERE l_quantity > 0.0 AND l_extendedprice > 0.0),
        |s AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_obs,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM q GROUP BY 1)
        |SELECT l_partkey, n_obs,
        |  CAST(n_obs * sxy - sx * sy AS DOUBLE)
        |    / CAST(n_obs * sxx - sx * sx AS DOUBLE) AS elasticity
        |FROM s WHERE n_obs * sxx - sx * sx <> 0
        |ORDER BY l_partkey""".stripMargin,

    "q_cohort_ltv" ->
      """WITH staged AS (
        |  SELECT user_id,
        |    CAST(date_trunc('week', min(ts) OVER (PARTITION BY user_id))
        |      AS DATE) AS cw,
        |    CAST(date_trunc('week', ts) AS DATE) AS ew,
        |    CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
        |      ELSE 0 END AS cents
        |  FROM events),
        |aged AS (
        |  SELECT user_id, cw,
        |    CAST(datediff('day', cw, ew) // 7 AS INTEGER) AS age, cents
        |  FROM staged),
        |users AS (
        |  SELECT cw AS cohort_week,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM aged GROUP BY 1),
        |rev AS (
        |  SELECT cw AS cohort_week, age AS age_weeks,
        |    CAST(sum(cents) AS BIGINT) AS rev
        |  FROM aged GROUP BY 1, 2)
        |SELECT r.cohort_week, r.age_weeks, u.n_users,
        |  CAST(sum(r.rev) OVER (PARTITION BY r.cohort_week
        |    ORDER BY r.age_weeks
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_rev_cents,
        |  CAST(sum(r.rev) OVER (PARTITION BY r.cohort_week
        |    ORDER BY r.age_weeks
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / 100.0 / CAST(u.n_users AS DOUBLE) AS ltv_per_user
        |FROM rev r JOIN users u ON r.cohort_week = u.cohort_week
        |ORDER BY r.cohort_week, r.age_weeks""".stripMargin,

    "q_ab_lift" ->
      s"""WITH pu AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > $AbConvMin
        |      THEN 1 ELSE 0 END) AS c,
        |    user_id % 2 AS b
        |  FROM events GROUP BY user_id),
        |s AS (
        |  SELECT
        |    CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN b = 0 THEN c ELSE 0 END) AS BIGINT)
        |      AS conv_a,
        |    CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN b = 1 THEN c ELSE 0 END) AS BIGINT)
        |      AS conv_b
        |  FROM pu)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
        |  CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
        |  CASE WHEN conv_a = 0 THEN NULL
        |    ELSE CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |      / (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)) - 1.0
        |  END AS lift,
        |  CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
        |    THEN NULL
        |    ELSE (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |      - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |    / sqrt((CAST(conv_a + conv_b AS DOUBLE)
        |        / CAST(n_a + n_b AS DOUBLE))
        |      * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
        |        / CAST(n_a + n_b AS DOUBLE))
        |      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
        |  END AS z
        |FROM s""".stripMargin)
}
