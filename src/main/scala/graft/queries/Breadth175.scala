package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-seventy-sixth wave — SYNTHETIC CONTROL (lite) with PLACEBO
  * inference, the causal design for ONE treated unit and a donor pool
  * (CUPED and diff-in-diff, already in the tier, need many treated
  * units). Unit = user cohort (user_id mod 7), outcome = daily spend
  * (cents), pre-period Jan 1–14, post Jan 15–30:
  *
  *  - **q_synth_control**: cohort 0 as treated — per post day, the
  *    treated series, the donor-weighted counterfactual (weights ∝
  *    1/(preMSE+1), the inverse-pre-fit heuristic — documented
  *    simplification of the constrained regression the full method
  *    solves), and the daily effect.
  *  - **q_placebo**: the same machinery re-run with EVERY cohort as
  *    the pretend-treated unit — the standard permutation inference:
  *    if cohort 0's |mean effect| does not rank extreme among the 7,
  *    the "effect" is noise. Emits each cohort's mean post effect and
  *    its |effect| rank.
  *
  * Exact-parity discipline: daily cells are exact cent sums on a
  * DENSE (cohort × day) grid; preMSE is an exact BIGINT (diff² ≤
  * ~2.5e15 at sf0.1, int64 to ~sf1 — rebase to dollars past that,
  * documented); weights are integer 1e18 div (mse+1) with one
  * normalizing division; counterfactual terms floor(w·s·1e3 + 0.5)
  * are order-free BIGINT milli-cents; the daily effect is ONE
  * division of the exact integer y·1000 − c.
  *
  * Scale shape: one hash aggregate to the 7×30 grid; everything after
  * is metadata-sized (7² donor pairs, 7×16 post cells). At 100 TB the
  * only corpus-scale stage is the first aggregate — the method's
  * cost does not grow with rows at all past it.
  */
object Breadth175 {

  private[graft] val Cutoff = "2024-01-15"
  private[graft] val NGroups = 7L

  /** Per-(treated, day) effect rows for every pretend-treated cohort
    * (internal). */
  private[graft] def effects(events: DataFrame): DataFrame = {
    val cells = events.filter(col("value").isNotNull)
      .select((col("user_id") % NGroups).as("grp"),
        col("ts").cast("date").as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("__c"))
      .groupBy(col("grp"), col("day")).agg(sum(col("__c")).as("s"))
    val days = cells.select(col("day")).distinct()
    val dense = days
      .select(col("day"),
        explode(sequence(lit(0L), lit(NGroups - 1))).as("grp"))
      .join(cells, Seq("grp", "day"), "left")
      .select(col("grp"), col("day"), coalesce(col("s"), lit(0L)).as("s"))
    val t = dense.select(col("grp").as("tg"), col("day").as("__d1"),
      col("s").as("__st"))
    val d = dense.select(col("grp").as("ig"), col("day").as("__d2"),
      col("s").as("__si"))
    val mse = t.join(d,
        col("__d1") === col("__d2") && col("tg") =!= col("ig"))
      .filter(col("__d1") < lit(Cutoff).cast("date"))
      .groupBy(col("tg"), col("ig"))
      .agg(sum((col("__st") - col("__si")) * (col("__st") - col("__si")))
        .as("__mse"))
      .withColumn("__r", expr("1000000000000000000 div (__mse + 1)"))
    val sr = mse.groupBy(col("tg")).agg(sum(col("__r")).as("__sr"))
      .select(col("tg").as("__tg2"), col("__sr"))
    val w = mse.join(broadcast(sr), col("tg") === col("__tg2"))
      .select(col("tg"), col("ig"), col("__r"), col("__sr"))
    val post = dense.filter(col("day") >= lit(Cutoff).cast("date"))
    val donorsPost = post.select(col("grp").as("ig"), col("day"),
      col("s").as("__si"))
    val synth = w.join(donorsPost, Seq("ig"))
      .select(col("tg"), col("day"),
        floor(col("__r").cast("double") / col("__sr").cast("double") *
          col("__si").cast("double") * lit(1.0e3) + lit(0.5))
          .cast("long").as("__t"))
      .groupBy(col("tg"), col("day")).agg(sum(col("__t")).as("__cMilli"))
    val y = post.select(col("grp").as("tg"), col("day"),
      col("s").as("treated_cents"))
    y.join(synth, Seq("tg", "day"))
      .select(col("tg"), col("day"), col("treated_cents"),
        (col("__cMilli").cast("double") / lit(1000.0)).as("synth_cents"),
        ((col("treated_cents") * 1000 - col("__cMilli")).cast("double") /
          lit(1000.0)).as("effect_cents"),
        // exact integer milli-cent effect, kept for the placebo sum
        // (a double->int recast would round in DuckDB but truncate in
        // Spark)
        (col("treated_cents") * 1000 - col("__cMilli")).as("__effMilli"))
  }

  /** The treated cohort's daily effect table. */
  private[graft] def synthControl(events: DataFrame): DataFrame =
    effects(events).filter(col("tg") === 0)
      .select(col("day"), col("treated_cents"), col("synth_cents"),
        col("effect_cents"))
      .orderBy(col("day").asc)

  /** Placebo distribution: every cohort as pretend-treated. */
  private[graft] def placebo(events: DataFrame): DataFrame = {
    val per = effects(events)
      .groupBy(col("tg"))
      .agg(count(lit(1)).as("n_post_days"),
        sum(col("__effMilli")).as("__em"))
      .select(col("tg"), col("n_post_days"),
        (col("__em").cast("double") /
          (col("n_post_days") * lit(1000L)).cast("double"))
          .as("mean_effect_cents"))
    per.withColumn("abs_rank",
        row_number().over(Window.orderBy(
          abs(col("mean_effect_cents")).desc, col("tg").asc)).cast("long"))
      .orderBy(col("tg").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_synth_control" -> ((s, dir) => synthControl(Tables.events(s, dir))),
    "q_placebo" -> ((s, dir) => placebo(Tables.events(s, dir))))

  /** Effect CTE chain (no leading WITH), shared. */
  private val EffSql: String =
    s"""cells AS (
       |  SELECT user_id % $NGroups AS grp, CAST(ts AS DATE) AS day,
       |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
       |      AS s
       |  FROM events WHERE value IS NOT NULL
       |  GROUP BY 1, 2),
       |days AS (SELECT DISTINCT day FROM cells),
       |dense AS (
       |  SELECT g.grp, days.day, coalesce(cells.s, 0) AS s
       |  FROM days CROSS JOIN (SELECT unnest(range(0, $NGroups)) AS grp) g
       |  LEFT JOIN cells ON cells.grp = g.grp AND cells.day = days.day),
       |mse AS (
       |  SELECT t.grp AS tg, d.grp AS ig,
       |    CAST(sum((t.s - d.s) * (t.s - d.s)) AS BIGINT) AS mse
       |  FROM dense t JOIN dense d
       |    ON t.day = d.day AND t.grp <> d.grp
       |  WHERE t.day < DATE '$Cutoff'
       |  GROUP BY t.grp, d.grp),
       |wt AS (
       |  SELECT tg, ig, 1000000000000000000 // (mse + 1) AS r
       |  FROM mse),
       |sr AS (SELECT tg, CAST(sum(r) AS BIGINT) AS sr FROM wt GROUP BY tg),
       |synth AS (
       |  SELECT wt.tg, d.day,
       |    CAST(sum(CAST(floor(CAST(wt.r AS DOUBLE)
       |      / CAST(sr.sr AS DOUBLE) * CAST(d.s AS DOUBLE) * 1.0e3 + 0.5)
       |      AS BIGINT)) AS BIGINT) AS c_milli
       |  FROM wt JOIN sr ON wt.tg = sr.tg
       |  JOIN dense d ON d.grp = wt.ig
       |  WHERE d.day >= DATE '$Cutoff'
       |  GROUP BY wt.tg, d.day),
       |eff AS (
       |  SELECT y.grp AS tg, y.day, y.s AS treated_cents,
       |    CAST(synth.c_milli AS DOUBLE) / 1000.0 AS synth_cents,
       |    CAST(y.s * 1000 - synth.c_milli AS DOUBLE) / 1000.0
       |      AS effect_cents,
       |    CAST(y.s * 1000 - synth.c_milli AS BIGINT) AS eff_milli
       |  FROM dense y JOIN synth ON y.grp = synth.tg
       |    AND y.day = synth.day
       |  WHERE y.day >= DATE '$Cutoff')""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_synth_control" ->
      s"""WITH $EffSql
         |SELECT day, treated_cents, synth_cents, effect_cents
         |FROM eff
         |WHERE tg = 0
         |ORDER BY day""".stripMargin,

    "q_placebo" ->
      s"""WITH $EffSql,
         |per AS (
         |  SELECT tg, CAST(count(*) AS BIGINT) AS n_post_days,
         |    CAST(sum(eff_milli) AS BIGINT) AS em
         |  FROM eff GROUP BY tg)
         |SELECT tg, n_post_days,
         |  CAST(em AS DOUBLE) / CAST(n_post_days * 1000 AS DOUBLE)
         |    AS mean_effect_cents,
         |  CAST(row_number() OVER (
         |    ORDER BY abs(CAST(em AS DOUBLE)
         |      / CAST(n_post_days * 1000 AS DOUBLE)) DESC, tg)
         |    AS BIGINT) AS abs_rank
         |FROM per
         |ORDER BY tg""".stripMargin)
}
