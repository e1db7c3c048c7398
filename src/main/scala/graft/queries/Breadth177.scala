package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-seventy-eighth wave — INVERSE-PROPENSITY WEIGHTING, the
  * observational-causal estimator the tier still lacked (CUPED and
  * diff-in-diff assume randomization; synthetic control needs one
  * treated unit). Units = users; "treatment" is a deterministic md5
  * draw whose RATE RISES with the user's activity quartile — a
  * built-in confounder, so the naive treated-vs-control difference is
  * biased by construction and the stratified IPW correction is doing
  * real work.
  *
  *  - **q_propensity_table**: the design table — per activity
  *    quartile: users, treated count, the empirical propensity
  *    p̂_q, and the control odds-weight w = p̂/(1−p̂) in 1e-6 units.
  *  - **q_ipw_att**: one row — the naive mean difference vs the ATT
  *    estimate that reweights controls by w (so controls mimic the
  *    treated covariate mix).
  *
  * Exact-parity discipline: quartiles are exact rank buckets; the
  * odds weight is the INTEGER (t_q·1e6) div (n_q−t_q); the weighted
  * control mean is Σ w·y / Σ w over exact BIGINTs (terms ≤ ~3e14 at
  * sf0.1 — int64 headroom to ~3e4× that); every emitted number is
  * one division or a subtraction of two such divisions. Degenerate
  * strata (all treated / all control) drop out with a NULL-guarded
  * weight, mirrored in the oracle.
  *
  * Scale shape: one per-user aggregate, one rank window (documented
  * approx swap), one 4-row propensity broadcast, one final aggregate
  * — no joins beyond the broadcast, nothing quadratic.
  */
object Breadth177 {

  /** Per-user covariate/treatment/outcome table (internal). */
  private[graft] def users(events: DataFrame): DataFrame = {
    val per = events.filter(col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("__act"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("__y"))
    val w = Window.orderBy(col("__act").asc, col("user_id").asc)
    val n = per.agg(count(lit(1)).as("__n"))
    per
      .withColumn("__rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(n))
      .withColumn("quartile", expr("((__rk - 1) * 4) div __n"))
      .withColumn("__h",
        pmod(conv(substring(md5(concat(lit("ipw#"),
          col("user_id").cast("string"))), 1, 15), 16, 10).cast("long"),
          lit(100L)))
      .withColumn("treated", col("__h") < lit(20L) + lit(15L) * col("quartile"))
      .select(col("user_id"), col("quartile"), col("treated"), col("__y"))
  }

  /** Per-quartile propensity design table. */
  private[graft] def propensityTable(events: DataFrame): DataFrame =
    users(events)
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("treated"), 1L).otherwise(0L)).as("n_treated"))
      .select(col("quartile"), col("n"), col("n_treated"),
        (col("n_treated").cast("double") / col("n").cast("double"))
          .as("p_hat"),
        when(col("n") - col("n_treated") === 0, lit(null)).otherwise(
          expr("(n_treated * 1000000) div (n - n_treated)")).as("w_1e6"))
      .orderBy(col("quartile").asc)

  /** Naive vs IPW-weighted ATT. */
  private[graft] def ipwAtt(events: DataFrame): DataFrame = {
    val u = users(events)
    val pt = propensityTable(events)
      .select(col("quartile").as("__q2"), col("w_1e6"))
    u.join(broadcast(pt), col("quartile") === col("__q2"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("treated"), 1L).otherwise(0L)).as("n_treated"),
        sum(when(col("treated"), col("__y")).otherwise(0L)).as("__yt"),
        sum(when(!col("treated"), col("__y")).otherwise(0L)).as("__yc"),
        sum(when(!col("treated"), 1L).otherwise(0L)).as("__nc"),
        sum(when(!col("treated"), col("w_1e6") * col("__y"))
          .otherwise(0L)).as("__wy"),
        sum(when(!col("treated"), col("w_1e6")).otherwise(0L)).as("__ws"))
      .select(col("n_users"), col("n_treated"),
        (col("__yt").cast("double") / col("n_treated").cast("double") -
          col("__yc").cast("double") / col("__nc").cast("double"))
          .as("naive_diff_cents"),
        (col("__yt").cast("double") / col("n_treated").cast("double") -
          col("__wy").cast("double") / col("__ws").cast("double"))
          .as("att_ipw_cents"))
  }

  val defs: Map[String, Q] = Map(
    "q_propensity_table" -> ((s, dir) =>
      propensityTable(Tables.events(s, dir))),
    "q_ipw_att" -> ((s, dir) => ipwAtt(Tables.events(s, dir))))

  /** User-table CTE chain (no leading WITH), shared. */
  private val UserSql: String =
    """per AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS act,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS y
      |  FROM events WHERE value IS NOT NULL
      |  GROUP BY user_id),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per),
      |u AS (
      |  SELECT user_id, y,
      |    ((CAST(row_number() OVER (ORDER BY act, user_id) AS BIGINT)
      |      - 1) * 4) // nn.n AS quartile,
      |    ('0x' || substr(md5('ipw#' || CAST(user_id AS VARCHAR)),
      |      1, 15))::BIGINT % 100 AS h
      |  FROM per CROSS JOIN nn),
      |ut AS (
      |  SELECT user_id, quartile, y,
      |    h < 20 + 15 * quartile AS treated
      |  FROM u),
      |pt AS (
      |  SELECT quartile, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_treated
      |  FROM ut GROUP BY quartile),
      |ptw AS (
      |  SELECT quartile, n, n_treated,
      |    CASE WHEN n - n_treated = 0 THEN NULL
      |      ELSE (n_treated * 1000000) // (n - n_treated) END AS w
      |  FROM pt)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_propensity_table" ->
      s"""WITH $UserSql
         |SELECT quartile, n, n_treated,
         |  CAST(n_treated AS DOUBLE) / CAST(n AS DOUBLE) AS p_hat,
         |  CAST(w AS BIGINT) AS w_1e6
         |FROM ptw
         |ORDER BY quartile""".stripMargin,

    "q_ipw_att" ->
      s"""WITH $UserSql
         |SELECT CAST(count(*) AS BIGINT) AS n_users,
         |  CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_treated,
         |  CAST(sum(CASE WHEN treated THEN y ELSE 0 END) AS DOUBLE)
         |      / CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END) AS DOUBLE)
         |    - CAST(sum(CASE WHEN NOT treated THEN y ELSE 0 END)
         |        AS DOUBLE)
         |      / CAST(sum(CASE WHEN NOT treated THEN 1 ELSE 0 END)
         |        AS DOUBLE) AS naive_diff_cents,
         |  CAST(sum(CASE WHEN treated THEN y ELSE 0 END) AS DOUBLE)
         |      / CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END) AS DOUBLE)
         |    - CAST(sum(CASE WHEN NOT treated THEN ptw.w * y ELSE 0 END)
         |        AS DOUBLE)
         |      / CAST(sum(CASE WHEN NOT treated THEN ptw.w ELSE 0 END)
         |        AS DOUBLE) AS att_ipw_cents
         |FROM ut JOIN ptw ON ut.quartile = ptw.quartile""".stripMargin)
}
