package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixty-third wave — lifecycle survival, touch attribution, exact
  * higher moments.
  *
  *  - **q_survival**: the Kaplan-Meier survival curve over customer
  *    lifetimes (days between first and last order). A customer whose
  *    last order falls within `CensorDays` of the corpus max date is
  *    CENSORED (still alive — leaves the risk set without a death);
  *    everyone else churns at t = lifetime. S(t) = Π (1 − d_i/n_i)
  *    over event times, the estimator that handles censoring correctly
  *    where a naive empirical CDF would count the still-alive as
  *    churned. The factor chain runs as a running sum of ln over the
  *    ordered ≤|distinct lifetime| aggregate (both engines accumulate
  *    in the same ascending-t frame order; ln's 1-ulp libm drift is
  *    absorbed by the 6-dp emit round, the q_parkinson stance).
  *  - **q_attribution**: first-touch / last-touch marketing
  *    attribution — per user, the first `purchase` is the conversion;
  *    the event-type of the chronologically first and last event
  *    STRICTLY before it get the credit ("direct" when the conversion
  *    is the user's first event). Output: per channel, how many
  *    conversions it opened vs closed. One equi-join on user_id with a
  *    residual (ts, id) predicate, two per-user windows, two
  *    channel-domain aggregates.
  *  - **q_moments**: per event-type skewness and excess kurtosis of
  *    value, computed from EXACT integer power sums — cents are cast
  *    to decimal(38,0) and Σc, Σc², Σc³, Σc⁴ accumulate without
  *    rounding (c⁴ ≤ ~1.2e18 per row and ~1e25 summed at sf1 — far
  *    inside decimal(38)/HUGEINT, far outside double's 2^53), so the
  *    shuffle-order-nondeterministic float-sum problem never arises;
  *    the raw-moment skew/kurt formulas then run once per group on
  *    identical doubles (var^1.5 as var·sqrt(var) — sqrt is IEEE
  *    correctly-rounded, pow is not).
  *
  * Scale shape: q_survival is two orders-grained aggregates + a
  * broadcast scalar + windows over the ≤|distinct lifetime| table;
  * q_attribution shuffles once on user_id; q_moments is a single
  * map-side-combinable groupBy. */
object Breadth62 {

  private[graft] val CensorDays = 180

  /** Kaplan-Meier over per-customer order-span lifetimes; censored =
    * last order within `censorDays` of the corpus max date. */
  private[graft] def survivalKm(orders: DataFrame,
                                censorDays: Int = CensorDays): DataFrame = {
    val per = orders
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate").cast("date")).as("__first"),
        max(col("o_orderdate").cast("date")).as("__last"))
      .withColumn("__lt", datediff(col("__last"), col("__first")))
    val maxd = orders.agg(max(col("o_orderdate").cast("date")).as("__maxd"))
    val flagged = per.crossJoin(broadcast(maxd))
      .withColumn("__churn",
        (datediff(col("__maxd"), col("__last")) >= lit(censorDays)).cast("int"))
    val byT = flagged
      .groupBy(col("__lt").as("t"))
      .agg(sum(col("__churn")).cast("long").as("d"),
        sum(lit(1) - col("__churn")).cast("long").as("c"))
    val all = Window.partitionBy()
    val before = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_at_risk",
        sum(col("d") + col("c")).over(all) -
          coalesce(sum(col("d") + col("c")).over(before), lit(0L)))
      .withColumn("__f",
        (col("n_at_risk") - col("d")).cast("double") /
          col("n_at_risk").cast("double"))
      // A zero factor (risk set emptying exactly at a churn time — only
      // possible on the final event time) is handled explicitly: Spark's
      // log(0) is NULL while DuckDB's ln(0) is -inf, so the ln-sum path
      // would silently diverge there.
      .withColumn("survival",
        when(max(when(col("__f") === 0.0, 1).otherwise(0)).over(upTo) === 1,
          lit(0.0))
          .otherwise(round(exp(sum(log(col("__f"))).over(upTo)), 6)))
      .filter(col("d") > 0)
      .select(col("t"), col("n_at_risk"), col("d"), col("survival"))
      .orderBy(col("t").asc)
  }

  /** First/last-touch attribution: conversion = first `convType` event
    * per key; credit the first and last event strictly before it. */
  private[graft] def attribution(df: DataFrame, keyCol: String,
                                 tsCol: String, idCol: String,
                                 typeCol: String,
                                 convType: String): DataFrame = {
    val firstConv = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val conv = df.filter(col(typeCol) === convType)
      .withColumn("__rn", row_number().over(firstConv))
      .filter(col("__rn") === 1)
      .select(col(keyCol).as("__k"), col(tsCol).as("__cts"),
        col(idCol).as("__cid"))
    val pri = df.join(conv,
      col(keyCol) === col("__k") &&
        (col(tsCol) < col("__cts") ||
          (col(tsCol) === col("__cts") && col(idCol) < col("__cid"))))
    val wF = Window.partitionBy(col("__k"))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val wL = Window.partitionBy(col("__k"))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    val ftlt = pri
      .withColumn("__rnf", row_number().over(wF))
      .withColumn("__rnl", row_number().over(wL))
      .groupBy(col("__k"))
      .agg(max(when(col("__rnf") === 1, col(typeCol))).as("__ft"),
        max(when(col("__rnl") === 1, col(typeCol))).as("__lt"))
    val perUser = conv.join(ftlt, Seq("__k"), "left")
      .select(coalesce(col("__ft"), lit("direct")).as("__ft"),
        coalesce(col("__lt"), lit("direct")).as("__lt"))
    val f = perUser.groupBy(col("__ft").as("channel"))
      .agg(count(lit(1)).as("n_first"))
    val l = perUser.groupBy(col("__lt").as("channel"))
      .agg(count(lit(1)).as("n_last"))
    f.join(l, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        coalesce(col("n_last"), lit(0L)).as("n_last"))
      .orderBy(col("channel").asc)
  }

  /** Per-group skewness + excess kurtosis from exact decimal power
    * sums of cents (population formulas, raw moments). */
  private[graft] def moments(df: DataFrame, groupCol: String,
                             valCol: String): DataFrame = {
    val d = floor(col(valCol) * lit(100.0) + lit(0.5)).cast("long")
      .cast("decimal(38,0)")
    val agg = df
      .withColumn("__d", d)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__d")).as("__s1"),
        sum(col("__d") * col("__d")).as("__s2"),
        sum(col("__d") * col("__d") * col("__d")).as("__s3"),
        sum(col("__d") * col("__d") * col("__d") * col("__d")).as("__s4"))
    val nD = col("n").cast("double")
    val m1 = col("__s1").cast("double") / nD
    val m2 = col("__s2").cast("double") / nD
    val m3 = col("__s3").cast("double") / nD
    val m4 = col("__s4").cast("double") / nD
    val vr = m2 - m1 * m1
    agg.select(col(groupCol), col("n"),
      round(m1 / lit(100.0), 6).as("mean"),
      round((m3 - lit(3.0) * m1 * m2 + lit(2.0) * m1 * m1 * m1) /
        (vr * sqrt(vr)), 6).as("skew"),
      round((m4 - lit(4.0) * m1 * m3 + lit(6.0) * m1 * m1 * m2 -
        lit(3.0) * m1 * m1 * m1 * m1) / (vr * vr) - lit(3.0), 6).as("kurt"))
      .orderBy(col(groupCol).asc)
  }

  val defs: Map[String, Q] = Map(
    "q_survival" -> ((s, dir) => survivalKm(Tables.orders(s, dir))),
    "q_attribution" -> ((s, dir) =>
      attribution(Tables.events(s, dir), "user_id", "ts", "event_id",
        "event_type", "purchase")),
    "q_moments" -> ((s, dir) =>
      moments(Tables.events(s, dir), "event_type", "value")))

  val oracle: Map[String, String] = Map(
    "q_survival" ->
      s"""WITH per AS (
         |  SELECT o_custkey,
         |    min(CAST(o_orderdate AS DATE)) AS f,
         |    max(CAST(o_orderdate AS DATE)) AS l
         |  FROM orders GROUP BY 1),
         |mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
         |fl AS (
         |  SELECT CAST(datediff('day', f, l) AS INTEGER) AS lt,
         |    CASE WHEN datediff('day', l, maxd) >= $CensorDays
         |      THEN 1 ELSE 0 END AS churn
         |  FROM per, mx),
         |byt AS (
         |  SELECT lt AS t, CAST(sum(churn) AS BIGINT) AS d,
         |    CAST(sum(1 - churn) AS BIGINT) AS c
         |  FROM fl GROUP BY 1),
         |rk AS (
         |  SELECT t, d,
         |    CAST(sum(d + c) OVER () AS BIGINT)
         |      - CAST(coalesce(sum(d + c) OVER (ORDER BY t
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |        AS BIGINT) AS n_at_risk
         |  FROM byt),
         |fc AS (
         |  SELECT t, d, n_at_risk,
         |    CAST(n_at_risk - d AS DOUBLE) / CAST(n_at_risk AS DOUBLE) AS f
         |  FROM rk),
         |sv AS (
         |  SELECT t, n_at_risk, d,
         |    CASE WHEN max(CASE WHEN f = 0.0 THEN 1 ELSE 0 END)
         |        OVER (ORDER BY t
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
         |      THEN 0.0
         |      ELSE round(exp(sum(CASE WHEN f > 0.0 THEN ln(f) END)
         |        OVER (ORDER BY t
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
         |    END AS survival
         |  FROM fc)
         |SELECT t, n_at_risk, d, survival
         |FROM sv WHERE d > 0 ORDER BY t""".stripMargin,

    "q_attribution" ->
      """WITH conv AS (
        |  SELECT user_id AS k, ts AS cts, event_id AS cid FROM (
        |    SELECT user_id, ts, event_id,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS rn
        |    FROM events WHERE event_type = 'purchase')
        |  WHERE rn = 1),
        |pri AS (
        |  SELECT v.k, e.event_type, e.ts, e.event_id
        |  FROM events e JOIN conv v ON e.user_id = v.k
        |    AND (e.ts < v.cts OR (e.ts = v.cts AND e.event_id < v.cid))),
        |ftlt AS (
        |  SELECT k,
        |    max(CASE WHEN rnf = 1 THEN event_type END) AS ft,
        |    max(CASE WHEN rnl = 1 THEN event_type END) AS lt
        |  FROM (
        |    SELECT k, event_type,
        |      row_number() OVER (PARTITION BY k
        |        ORDER BY ts, event_id) AS rnf,
        |      row_number() OVER (PARTITION BY k
        |        ORDER BY ts DESC, event_id DESC) AS rnl
        |    FROM pri)
        |  GROUP BY k),
        |peruser AS (
        |  SELECT coalesce(ft, 'direct') AS ft, coalesce(lt, 'direct') AS lt
        |  FROM conv LEFT JOIN ftlt ON conv.k = ftlt.k)
        |SELECT coalesce(f.channel, l.channel) AS channel,
        |  coalesce(f.n_first, 0) AS n_first,
        |  coalesce(l.n_last, 0) AS n_last
        |FROM (SELECT ft AS channel, CAST(count(*) AS BIGINT) AS n_first
        |      FROM peruser GROUP BY 1) f
        |FULL OUTER JOIN
        |     (SELECT lt AS channel, CAST(count(*) AS BIGINT) AS n_last
        |      FROM peruser GROUP BY 1) l
        |ON f.channel = l.channel
        |ORDER BY channel""".stripMargin,

    "q_moments" ->
      """WITH s AS (
        |  SELECT event_type,
        |    CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
        |      AS HUGEINT)) AS s1,
        |    sum(CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
        |      AS HUGEINT) * CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS s2,
        |    sum(CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
        |      AS HUGEINT) * CAST(floor(value * 100.0 + 0.5) AS BIGINT)
        |      * CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS s3,
        |    sum(CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
        |      AS HUGEINT) * CAST(floor(value * 100.0 + 0.5) AS BIGINT)
        |      * CAST(floor(value * 100.0 + 0.5) AS BIGINT)
        |      * CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS s4
        |  FROM events GROUP BY event_type),
        |m AS (
        |  SELECT event_type, n,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
        |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS m2,
        |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS m3,
        |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS m4
        |  FROM s),
        |v AS (SELECT *, m2 - m1 * m1 AS vr FROM m)
        |SELECT event_type, n,
        |  round(m1 / 100.0, 6) AS mean,
        |  round((m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1)
        |    / (vr * sqrt(vr)), 6) AS skew,
        |  round((m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2
        |      - 3.0 * m1 * m1 * m1 * m1) / (vr * vr) - 3.0, 6) AS kurt
        |FROM v ORDER BY event_type""".stripMargin)
}
