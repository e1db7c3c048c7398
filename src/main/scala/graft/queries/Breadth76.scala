package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventy-seventh wave — volatility clustering, portmanteau testing,
  * mean-reversion speed.
  *
  *  - **q_arch_effect**: the ARCH-effect screen — lag-1 rank
  *    autocorrelation of move MAGNITUDE (volatility clusters when big
  *    moves follow big moves regardless of sign; ranks make it the
  *    Spearman-robust form AND keep every moment an exact int64 —
  *    raw x² needs Σx⁴, which overflows at the observed 4.6e4-cent
  *    moves).
  *  - **q_ljung_box**: the Ljung-Box Q(5) portmanteau test on day
  *    moves. Autocorrelations use the textbook FULL-SAMPLE-mean form,
  *    kept exact by centring through the ×n trick (cₜ = n·xₜ − Σx is
  *    an integer, and ρₖ = Σcₜcₜ₋ₖ / Σc² is ONE division); Q sums the
  *    five ρₖ²/(n−k) terms in fixed k order and the χ²₅ 95% verdict
  *    compares the unrounded Q.
  *  - **q_half_life**: Ornstein-Uhlenbeck-style mean-reversion
  *    half-life from the AR(1) regression of Δclose on the prior
  *    close level — slope from exact integer moments, half-life
  *    −ln2/ln(1+b) for reverting keys only (−1 < b < 0), 6-dp-rounded
  *    on both engines (the transcendental stance).
  *
  * Scale shape: all three are per-key windows + map-side-combinable
  * integer sums over the memoized day-move/bar grids — one
  * |key·days| shuffle each, |keys|-row outputs. */
object Breadth76 {

  private[graft] val LbLags = 5
  /** χ²(5 dof) upper 5% critical value — the Ljung-Box bound. */
  private[graft] val LbCrit = 11.0705

  /** Lag-1 rank ACF of move MAGNITUDE per key — the Spearman-robust
    * ARCH screen. Raw x² pairs would need Σx⁴ (overflows int64 at the
    * observed 4.6e4-cent moves, and the decimal/HUGEINT→double rescue
    * casts diverge in the last ulp — the q_jensen_alpha lesson), so
    * magnitudes are reduced to their fully tie-broken (|x|, day)
    * ranks: rank products are bounded by n² and every moment stays an
    * exact int64 on both engines. */
  private[graft] def archEffect(df: DataFrame, keyCol: String, tsCol: String,
                                valCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val mag = Window.partitionBy(col(keyCol))
      .orderBy(abs(col("__x")).asc, col("day").asc)
    val g = Breadth67.dayMoves(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__e", row_number().over(mag).cast("long"))
      .withColumn("__y", lag(col("__e"), 1).over(w))
      .filter(col("__y").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__e")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__e") * col("__y")).as("__sxy"),
        sum(col("__e") * col("__e")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    val num = col("n_pairs") * col("__sxy") - col("__sx") * col("__sy")
    val vx = col("n_pairs") * col("__sxx") - col("__sx") * col("__sx")
    val vy = col("n_pairs") * col("__syy") - col("__sy") * col("__sy")
    g.select(col(keyCol), col("n_pairs"),
      when(vx > 0 && vy > 0,
        num.cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
        .as("arch_r1"))
      .orderBy(col(keyCol).asc)
  }

  /** Ljung-Box Q over lags 1..`LbLags` on day moves per key. */
  private[graft] def ljungBox(df: DataFrame, keyCol: String, tsCol: String,
                              valCol: String, tieBreak: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val cen = Breadth67.dayMoves(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__n", count(lit(1)).over(byKey))
      .withColumn("__s", sum(col("__x")).over(byKey))
      .withColumn("__c", col("__n") * col("__x") - col("__s"))
    val lagged = (1 to LbLags).foldLeft(cen) { (d, k) =>
      d.withColumn(s"__c$k", lag(col("__c"), k).over(w))
    }
    val g = lagged.groupBy(col(keyCol))
      .agg(max(col("__n")).as("n_days"),
        sum(col("__c") * col("__c")).as("__d") +:
          (1 to LbLags).map(k =>
            sum(when(col(s"__c$k").isNotNull, col("__c") * col(s"__c$k"))
              .otherwise(lit(0L))).as(s"__a$k")): _*)
    val nD = col("n_days").cast("double")
    def rho(k: Int): Column =
      col(s"__a$k").cast("double") / col("__d").cast("double")
    val qSum = (1 to LbLags).map(k =>
      rho(k) * rho(k) / (nD - lit(k.toDouble))).reduce(_ + _)
    val q = nD * (nD + lit(2.0)) * qSum
    g.select(col(keyCol), col("n_days"),
      when(col("__d") > 0 && col("n_days") > LbLags, q).as("q_lb"),
      when(col("__d") > 0 && col("n_days") > LbLags, q > lit(LbCrit))
        .as("reject_iid"))
      .orderBy(col(keyCol).asc)
  }

  /** AR(1) mean-reversion half-life per key (reverting keys only). */
  private[graft] def halfLife(df: DataFrame, keyCol: String, tsCol: String,
                              valCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val g = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__p", lag(col("close"), 1).over(w))
      .filter(col("__p").isNotNull)
      .withColumn("__d", col("close") - col("__p"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_moves"),
        sum(col("__p")).as("__sp"), sum(col("__d")).as("__sd"),
        sum(col("__p") * col("__d")).as("__spd"),
        sum(col("__p") * col("__p")).as("__spp"))
    val num = col("n_moves") * col("__spd") - col("__sp") * col("__sd")
    val den = col("n_moves") * col("__spp") - col("__sp") * col("__sp")
    val b = num.cast("double") / den.cast("double")
    g.select(col(keyCol), col("n_moves"),
      when(den > 0, b).as("ar1_slope"),
      when(den > 0 && b > -1.0 && b < 0.0,
        round(-log(lit(2.0)) / log(lit(1.0) + b), 6)).as("half_life_days"))
      .orderBy(col(keyCol).asc)
  }

  val defs: Map[String, Q] = Map(
    "q_arch_effect" -> ((s, dir) =>
      archEffect(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_ljung_box" -> ((s, dir) =>
      ljungBox(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_half_life" -> ((s, dir) =>
      halfLife(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")))

  val oracle: Map[String, String] = Map(
    "q_arch_effect" ->
      s"""WITH ${Breadth67.movesSql},
         |e AS (
         |  SELECT user_id, day,
         |    CAST(row_number() OVER (PARTITION BY user_id
         |      ORDER BY abs(x), day) AS BIGINT) AS ee
         |  FROM mv),
         |p AS (
         |  SELECT user_id, ee,
         |    lag(ee) OVER (PARTITION BY user_id ORDER BY day) AS y
         |  FROM e),
         |g AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS np,
         |    CAST(sum(ee) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(ee * y) AS BIGINT) AS sxy,
         |    CAST(sum(ee * ee) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM p WHERE y IS NOT NULL GROUP BY 1)
         |SELECT user_id, np AS n_pairs,
         |  CASE WHEN np * sxx - sx * sx > 0 AND np * syy - sy * sy > 0
         |    THEN CAST(np * sxy - sx * sy AS DOUBLE)
         |      / (sqrt(CAST(np * sxx - sx * sx AS DOUBLE))
         |        * sqrt(CAST(np * syy - sy * sy AS DOUBLE)))
         |  END AS arch_r1
         |FROM g ORDER BY user_id""".stripMargin,

    "q_ljung_box" -> {
      val lagCols = (1 to LbLags).map(k =>
        s"    lag(c, $k) OVER (PARTITION BY user_id ORDER BY day) AS c$k")
        .mkString(",\n")
      val aAggs = (1 to LbLags).map(k =>
        s"    CAST(sum(CASE WHEN c$k IS NOT NULL THEN c * c$k ELSE 0 END)"
          + s" AS BIGINT) AS a$k").mkString(",\n")
      val qTerms = (1 to LbLags).map(k =>
        s"(CAST(a$k AS DOUBLE) / CAST(d AS DOUBLE))"
          + s" * (CAST(a$k AS DOUBLE) / CAST(d AS DOUBLE))"
          + s" / (CAST(n AS DOUBLE) - $k.0)").mkString("\n      + ")
      s"""WITH ${Breadth67.movesSql},
         |cen AS (
         |  SELECT user_id, day,
         |    count(*) OVER (PARTITION BY user_id) * x
         |      - sum(x) OVER (PARTITION BY user_id) AS c,
         |    count(*) OVER (PARTITION BY user_id) AS n
         |  FROM mv),
         |lg AS (
         |  SELECT user_id, n, c,
         |$lagCols
         |  FROM cen),
         |g AS (
         |  SELECT user_id, CAST(max(n) AS BIGINT) AS n,
         |    CAST(sum(c * c) AS BIGINT) AS d,
         |$aAggs
         |  FROM lg GROUP BY 1)
         |SELECT user_id, n AS n_days,
         |  CASE WHEN d > 0 AND n > $LbLags
         |    THEN CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
         |      * ($qTerms) END AS q_lb,
         |  CASE WHEN d > 0 AND n > $LbLags
         |    THEN CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
         |      * ($qTerms) > $LbCrit END AS reject_iid
         |FROM g ORDER BY user_id""".stripMargin
    },

    "q_half_life" ->
      s"""WITH ${Breadth67.movesSql},
         |p AS (
         |  SELECT user_id, close,
         |    lag(close) OVER (PARTITION BY user_id ORDER BY day) AS pc
         |  FROM bars),
         |g AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS m,
         |    CAST(sum(pc) AS BIGINT) AS sp,
         |    CAST(sum(close - pc) AS BIGINT) AS sd,
         |    CAST(sum(pc * (close - pc)) AS BIGINT) AS spd,
         |    CAST(sum(pc * pc) AS BIGINT) AS spp
         |  FROM p WHERE pc IS NOT NULL GROUP BY 1)
         |SELECT user_id, m AS n_moves,
         |  CASE WHEN m * spp - sp * sp > 0
         |    THEN CAST(m * spd - sp * sd AS DOUBLE)
         |      / CAST(m * spp - sp * sp AS DOUBLE) END AS ar1_slope,
         |  CASE WHEN m * spp - sp * sp > 0
         |    AND CAST(m * spd - sp * sd AS DOUBLE)
         |      / CAST(m * spp - sp * sp AS DOUBLE) > -1.0
         |    AND CAST(m * spd - sp * sd AS DOUBLE)
         |      / CAST(m * spp - sp * sp AS DOUBLE) < 0.0
         |    THEN round(-ln(2.0) / ln(1.0
         |      + CAST(m * spd - sp * sd AS DOUBLE)
         |        / CAST(m * spp - sp * sp AS DOUBLE)), 6)
         |  END AS half_life_days
         |FROM g ORDER BY user_id""".stripMargin)
}
