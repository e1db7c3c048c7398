package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-twentieth wave — resampling inference with EXACT rational
  * p-values, and multiple-testing control over them:
  *
  *  - **q_perm_test**: per key, the paired sign-flip permutation test
  *    of "mean day move = 0": T_obs = |Σx|, then R = 64 deterministic
  *    sign assignments s_rt = ±1 from the md5 parity of
  *    (key, day, r, seed) — the q_poisson_bootstrap RNG-free
  *    discipline — and p = (1 + #{|Σ s·x| ≥ T_obs}) / (R + 1). The
  *    p-value is an exact INTEGER numerator over the constant 65, so
  *    it is bit-equal cross-engine and safe to rank on.
  *  - **q_bh_fdr**: Benjamini–Hochberg at α = 1/10 over those exact
  *    p-values — rank ascending (key tiebreak), find the largest rank
  *    i with p_(i) ≤ α·i/m via the CROSS-MULTIPLIED integer compare
  *    (num·10·m ≤ 65·i — no division, no float), reject everything at
  *    or below it. The one operation resampling pipelines actually
  *    run after a per-key test fans out 10⁶ hypotheses.
  *
  * Scale shape: the permutation table is |keys|·|days|·R rows — R is a
  * constant and |keys|·|days| is the calendar-bounded move grid, so
  * the explode is linear in keys; the sums are map-side-combinable
  * integer aggregates. BH ranks the |keys|-sized p table (one global
  * sort of per-key rows — range-partition it at 10⁹ keys, the
  * q_ks_drift altitude note). */
object Breadth119 {

  private[graft] val PermR = 64
  private val PermSeed = "permv1"
  /** α = numAlpha/denAlpha = 1/10, kept as integers for the
    * cross-multiplied compare. */
  private val FdrDen = 10

  /** Day-over-day cent moves per key (consecutive-bar diffs). */
  private def dayMoves(df: DataFrame, keyCol: String, tsCol: String,
                       valCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__x", col("close") - lag(col("close"), 1).over(w))
      .filter(col("__x").isNotNull)
      .select(col(keyCol), col("day"), col("__x"))
  }

  /** ±1 sign from the md5 parity of (key, day, replicate, seed). */
  private def flipSign(keyCol: String, rep: Column): Column = {
    val h = conv(substring(md5(concat_ws("#", col(keyCol).cast("string"),
      col("day").cast("string"), rep.cast("string"),
      lit(PermSeed))), 1, 15), 16, 10).cast("long")
    when(h % 2 === 0, lit(1L)).otherwise(lit(-1L))
  }

  /** Exact-rational permutation p-value per key. */
  private[graft] def permTest(df: DataFrame, keyCol: String, tsCol: String,
                              valCol: String, tieBreak: String,
                              r: Int = PermR): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mv = dayMoves(df, keyCol, tsCol, valCol, tieBreak)
    val tobs = mv.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"), abs(sum(col("__x"))).as("t_abs"))
    val reps = (1 to r).toDF("__r")
    val perm = mv.crossJoin(broadcast(reps))
      .withColumn("__s", flipSign(keyCol, col("__r")))
      .groupBy(col(keyCol), col("__r"))
      .agg(abs(sum(col("__s") * col("__x"))).as("__tr"))
    perm.join(tobs, Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(max(col("n_days")).as("n_days"), max(col("t_abs")).as("t_abs"),
        (lit(1L) + sum(when(col("__tr") >= col("t_abs"), 1L)
          .otherwise(0L))).as("p_num"))
      .select(col(keyCol), col("n_days"), col("t_abs"), col("p_num"),
        (col("p_num").cast("double") / lit(r + 1).cast("double"))
          .as("p_value"))
      .orderBy(col(keyCol).asc)
  }

  /** BH step-up rejections at α = 1/FdrDen over the exact p numerators:
    * reject ranks ≤ the largest i with num·FdrDen·m ≤ (R+1)·i. */
  private[graft] def bhFdr(df: DataFrame, keyCol: String, tsCol: String,
                           valCol: String, tieBreak: String,
                           r: Int = PermR): DataFrame = {
    val p = permTest(df, keyCol, tsCol, valCol, tieBreak, r)
      .select(col(keyCol), col("p_num"), col("p_value"))
    val ord = Window.orderBy(col("p_num").asc, col(keyCol).asc)
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = p
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn("__m", count(lit(1)).over(all))
      .withColumn("__ok",
        col("p_num") * lit(FdrDen.toLong) * col("__m") <=
          lit((r + 1).toLong) * col("rank"))
    ranked
      .withColumn("__kstar", max(when(col("__ok"), col("rank"))).over(all))
      .select(col(keyCol), col("p_num"), col("p_value"), col("rank"),
        coalesce(col("rank") <= col("__kstar"), lit(false))
          .as("rejected"))
      .orderBy(col("rank").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_perm_test" -> ((s, dir) =>
      permTest(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_bh_fdr" -> ((s, dir) =>
      bhFdr(Tables.events(s, dir), "user_id", "ts", "value",
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
      |      last_value(c) OVER (PARTITION BY user_id, day ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cl
      |    FROM t)
      |  GROUP BY user_id, day),
      |mv AS (
      |  SELECT user_id, day, x FROM (
      |    SELECT user_id, day,
      |      close - lag(close) OVER (PARTITION BY user_id ORDER BY day) AS x
      |    FROM bars)
      |  WHERE x IS NOT NULL),
      |tobs AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
      |    abs(CAST(sum(x) AS BIGINT)) AS t_abs
      |  FROM mv GROUP BY 1),
      |perm AS (
      |  SELECT mv.user_id, r,
      |    abs(CAST(sum(CASE WHEN ('0x' || substr(md5(
      |        CAST(mv.user_id AS VARCHAR) || '#' ||
      |        strftime(mv.day, '%Y-%m-%d') || '#' ||
      |        CAST(r AS VARCHAR) || '#permv1'), 1, 15))::BIGINT % 2 = 0
      |      THEN x ELSE -x END) AS BIGINT)) AS tr
      |  FROM mv CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS r)
      |  GROUP BY 1, 2),
      |pv AS (
      |  SELECT p.user_id, max(t.n_days) AS n_days, max(t.t_abs) AS t_abs,
      |    1 + CAST(sum(CASE WHEN p.tr >= t.t_abs THEN 1 ELSE 0 END)
      |      AS BIGINT) AS p_num
      |  FROM perm p JOIN tobs t ON p.user_id = t.user_id
      |  GROUP BY 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_perm_test" ->
      s"""WITH $MovesSql
         |SELECT user_id, n_days, t_abs, p_num,
         |  CAST(p_num AS DOUBLE) / CAST(65 AS DOUBLE) AS p_value
         |FROM pv ORDER BY user_id""".stripMargin,

    "q_bh_fdr" ->
      s"""WITH $MovesSql,
         |ranked AS (
         |  SELECT user_id, p_num,
         |    CAST(p_num AS DOUBLE) / CAST(65 AS DOUBLE) AS p_value,
         |    CAST(row_number() OVER (ORDER BY p_num, user_id) AS BIGINT)
         |      AS rank,
         |    CAST(count(*) OVER () AS BIGINT) AS m
         |  FROM pv),
         |ks AS (
         |  SELECT max(CASE WHEN p_num * 10 * m <= 65 * rank
         |    THEN rank END) AS kstar
         |  FROM ranked)
         |SELECT user_id, p_num, p_value, rank,
         |  COALESCE(rank <= (SELECT kstar FROM ks), FALSE) AS rejected
         |FROM ranked ORDER BY rank""".stripMargin)
}
