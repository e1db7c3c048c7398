package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-fifth wave — cross-sectional distribution bands, lower-tail
  * co-movement, and conditioned (downside) beta.
  *
  *  - **q_percentile_bands**: the daily cross-section of key closes as
  *    rank-exact p10/p50/p90 bands — one count table per day (|keys|-
  *    bounded), ceil(p·n) selection, no approximate percentile.
  *  - **q_tail_dependence**: who crashes together — per key the
  *    bottom-decile day-move cutoff (rank-exact), then the Jaccard of
  *    crash-day sets per key pair, top 15. The pair join runs over
  *    crash days only (~n/10 per key), never the full day grid.
  *  - **q_beta_downside**: the one-factor beta estimated ONLY on
  *    market-down days — the q_beta diff/market chain conditioned on
  *    m < 0, quadratic moments in decimal(38,0) (exact; DuckDB twins
  *    them in HUGEINT), one double division at emit.
  *
  * Scale shape: bands and cutoffs rank value-domain count tables; the
  * market series is a |days|-sized aggregate joined back broadcast-
  * small; nothing touches tick grain after the memoized bar build. */
object Breadth104 {

  private val PairTopK = 15

  /** Daily p10/p50/p90 bands of the cross-section of key closes. */
  private[graft] def percentileBands(df: DataFrame, keyCol: String,
                                     tsCol: String, valCol: String,
                                     tieBreak: String): DataFrame = {
    val vc = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .groupBy(col("day"), col("close").as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val ord = Window.partitionBy(col("day")).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy(col("day"))
    def pick(k: Column) =
      max(when(k > col("__pre") && k <= col("__pre") + col("__cnt"),
        col("__v")))
    val t = vc
      .withColumn("__pre", coalesce(sum(col("__cnt")).over(ord), lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(all))
      // ceil(p·n) for p = 1/10, 1/2, 9/10 — integer-exact
      .withColumn("__k10",
        floor((col("__n") + 9L).cast("double") / lit(10.0)).cast("long"))
      .withColumn("__k50", shiftright(col("__n") + 1L, 1))
      .withColumn("__k90",
        floor((col("__n") * 9L + 9L).cast("double") / lit(10.0))
          .cast("long"))
    t.groupBy(col("day"))
      .agg(max(col("__n")).as("n_keys"),
        (pick(col("__k10")).cast("double") / lit(100.0)).as("p10"),
        (pick(col("__k50")).cast("double") / lit(100.0)).as("p50"),
        (pick(col("__k90")).cast("double") / lit(100.0)).as("p90"))
      .orderBy(col("day").asc)
  }

  /** Day-over-day cent moves per key on consecutive calendar days (the
    * q_beta diff convention). */
  private def dayMoves(df: DataFrame, keyCol: String, tsCol: String,
                       valCol: String, tieBreak: String): DataFrame = {
    val bars = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .select(col(keyCol), col("day"), col("close"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    bars.withColumn("__x", col("close") - lag(col("close"), 1).over(w))
      .filter(col("__x").isNotNull)
      .select(col(keyCol), col("day"), col("__x"))
  }

  /** Jaccard of bottom-decile crash-day sets per key pair, top 15. */
  private[graft] def tailDependence(df: DataFrame, keyCol: String,
                                    tsCol: String, valCol: String,
                                    tieBreak: String,
                                    k: Int = PairTopK): DataFrame = {
    val mv = dayMoves(df, keyCol, tsCol, valCol, tieBreak)
    val vc = mv.groupBy(col(keyCol), col("__x").as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val ord = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy(col(keyCol))
    val cut = vc
      .withColumn("__pre", coalesce(sum(col("__cnt")).over(ord), lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(all))
      .withColumn("__k",
        floor((col("__n") + 9L).cast("double") / lit(10.0)).cast("long"))
      .groupBy(col(keyCol).as("__ck"))
      .agg(max(when(col("__k") > col("__pre") &&
        col("__k") <= col("__pre") + col("__cnt"), col("__v")))
        .as("__cut"))
    val crash = mv.join(broadcast(cut), col(keyCol) === col("__ck"))
      .filter(col("__x") <= col("__cut"))
      .select(col(keyCol), col("day"))
    val counts = crash.groupBy(col(keyCol).as("__k1"))
      .agg(count(lit(1)).as("__c1"))
    val a = crash.select(col(keyCol).as("key_a"), col("day"))
    val b = crash.select(col(keyCol).as("key_b"), col("day"))
    a.join(b, Seq("day")).filter(col("key_a") < col("key_b"))
      .groupBy(col("key_a"), col("key_b"))
      .agg(count(lit(1)).as("n_joint"))
      .join(broadcast(counts.select(col("__k1").as("key_a"),
        col("__c1").as("crash_a"))), Seq("key_a"))
      .join(broadcast(counts.select(col("__k1").as("key_b"),
        col("__c1").as("crash_b"))), Seq("key_b"))
      .select(col("key_a"), col("key_b"), col("crash_a"), col("crash_b"),
        col("n_joint"),
        (col("n_joint").cast("double") /
          (col("crash_a") + col("crash_b") - col("n_joint")).cast("double"))
          .as("tail_jaccard"))
      .orderBy(col("tail_jaccard").desc, col("key_a").asc,
        col("key_b").asc)
      .limit(k)
  }

  /** One-factor beta on market-down days only. */
  private[graft] def downsideBeta(df: DataFrame, keyCol: String,
                                  tsCol: String, valCol: String,
                                  tieBreak: String): DataFrame = {
    val mv = dayMoves(df, keyCol, tsCol, valCol, tieBreak)
    val mkt = mv.groupBy(col("day")).agg(sum(col("__x")).as("__m"))
      .filter(col("__m") < 0)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def wide(c: Column): Column = c.cast(dec)
    val g = mv.join(broadcast(mkt), Seq("day"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_down"),
        sum(col("__x")).as("__sx"), sum(col("__m")).as("__sm"),
        sum(wide(col("__x")) * wide(col("__m"))).as("__sxm"),
        sum(wide(col("__m")) * wide(col("__m"))).as("__smm"))
    val num = wide(col("n_down")) * col("__sxm") -
      wide(col("__sx")) * wide(col("__sm"))
    val den = wide(col("n_down")) * col("__smm") -
      wide(col("__sm")) * wide(col("__sm"))
    g.select(col(keyCol), col("n_down"),
      when(den > 0, num.cast("double") / den.cast("double"))
        .as("beta_down"))
      .orderBy(col(keyCol).asc)
  }

  val defs: Map[String, Q] = Map(
    "q_percentile_bands" -> ((s, dir) =>
      percentileBands(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_tail_dependence" -> ((s, dir) =>
      tailDependence(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_beta_downside" -> ((s, dir) =>
      downsideBeta(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")))

  private val MovesSql =
    """t AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id
      |  FROM events),
      |bars AS (
      |  SELECT user_id, day, max(cl) AS close
      |  FROM (
      |    SELECT user_id, day,
      |      last_value(c) OVER (PARTITION BY user_id, day
      |        ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |        AS cl
      |    FROM t)
      |  GROUP BY user_id, day),
      |mv AS (
      |  SELECT user_id, day, x FROM (
      |    SELECT user_id, day,
      |      close - lag(close) OVER (PARTITION BY user_id ORDER BY day)
      |        AS x
      |    FROM bars)
      |  WHERE x IS NOT NULL)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_percentile_bands" ->
      """WITH t AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id
        |  FROM events),
        |bars AS (
        |  SELECT user_id, day, max(cl) AS close
        |  FROM (
        |    SELECT user_id, day,
        |      last_value(c) OVER (PARTITION BY user_id, day
        |        ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |        AS cl
        |    FROM t)
        |  GROUP BY user_id, day),
        |vc AS (
        |  SELECT day, close AS v, CAST(count(*) AS BIGINT) AS cnt
        |  FROM bars GROUP BY 1, 2),
        |rk AS (
        |  SELECT day, v, cnt,
        |    CAST(COALESCE(sum(cnt) OVER (PARTITION BY day ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS pre,
        |    CAST(sum(cnt) OVER (PARTITION BY day) AS BIGINT) AS n
        |  FROM vc)
        |SELECT day, CAST(max(n) AS BIGINT) AS n_keys,
        |  CAST(max(CASE WHEN (n + 9) // 10 > pre
        |    AND (n + 9) // 10 <= pre + cnt THEN v END) AS DOUBLE) / 100.0
        |    AS p10,
        |  CAST(max(CASE WHEN (n + 1) // 2 > pre
        |    AND (n + 1) // 2 <= pre + cnt THEN v END) AS DOUBLE) / 100.0
        |    AS p50,
        |  CAST(max(CASE WHEN (n * 9 + 9) // 10 > pre
        |    AND (n * 9 + 9) // 10 <= pre + cnt THEN v END) AS DOUBLE)
        |    / 100.0 AS p90
        |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_tail_dependence" ->
      s"""WITH $MovesSql,
         |vc AS (
         |  SELECT user_id, x AS v, CAST(count(*) AS BIGINT) AS cnt
         |  FROM mv GROUP BY 1, 2),
         |rk AS (
         |  SELECT user_id, v, cnt,
         |    CAST(COALESCE(sum(cnt) OVER (PARTITION BY user_id ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS pre,
         |    CAST(sum(cnt) OVER (PARTITION BY user_id) AS BIGINT) AS n
         |  FROM vc),
         |cut AS (
         |  SELECT user_id,
         |    CAST(max(CASE WHEN (n + 9) // 10 > pre
         |      AND (n + 9) // 10 <= pre + cnt THEN v END) AS BIGINT)
         |      AS cutv
         |  FROM rk GROUP BY 1),
         |crash AS (
         |  SELECT mv.user_id, mv.day
         |  FROM mv JOIN cut ON mv.user_id = cut.user_id
         |  WHERE mv.x <= cut.cutv),
         |cc AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM crash
         |  GROUP BY 1),
         |pairs AS (
         |  SELECT a.user_id AS key_a, b.user_id AS key_b,
         |    CAST(count(*) AS BIGINT) AS n_joint
         |  FROM crash a JOIN crash b
         |    ON a.day = b.day AND a.user_id < b.user_id
         |  GROUP BY 1, 2)
         |SELECT key_a, key_b, ca.c AS crash_a, cb.c AS crash_b, n_joint,
         |  CAST(n_joint AS DOUBLE) / CAST(ca.c + cb.c - n_joint AS DOUBLE)
         |    AS tail_jaccard
         |FROM pairs
         |JOIN cc ca ON key_a = ca.user_id
         |JOIN cc cb ON key_b = cb.user_id
         |ORDER BY tail_jaccard DESC, key_a, key_b
         |LIMIT $PairTopK""".stripMargin,

    "q_beta_downside" ->
      s"""WITH $MovesSql,
         |mk AS (
         |  SELECT day, CAST(sum(x) AS BIGINT) AS m FROM mv GROUP BY 1
         |  HAVING sum(x) < 0),
         |g AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_down,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(m) AS BIGINT) AS sm,
         |    sum(CAST(x AS HUGEINT) * CAST(m AS HUGEINT)) AS sxm,
         |    sum(CAST(m AS HUGEINT) * CAST(m AS HUGEINT)) AS smm
         |  FROM mv JOIN mk USING (day)
         |  GROUP BY 1)
         |SELECT user_id, n_down,
         |  CASE WHEN CAST(n_down AS HUGEINT) * smm
         |      - CAST(sm AS HUGEINT) * CAST(sm AS HUGEINT) > 0 THEN
         |    CAST(CAST(n_down AS HUGEINT) * sxm
         |        - CAST(sx AS HUGEINT) * CAST(sm AS HUGEINT) AS DOUBLE)
         |      / CAST(CAST(n_down AS HUGEINT) * smm
         |        - CAST(sm AS HUGEINT) * CAST(sm AS HUGEINT) AS DOUBLE)
         |  END AS beta_down
         |FROM g ORDER BY 1""".stripMargin)
}
