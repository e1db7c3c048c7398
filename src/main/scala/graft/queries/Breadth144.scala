package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hundred-forty-fifth wave — two evaluation primitives the analytics
  * tier still lacked:
  *
  * **q_did** — difference-in-differences over the event stream: the
  * 2×2 (treatment × period) causal design. Treatment is the
  * deterministic user_id-parity assignment (the q_hash_split /
  * q_ab_lift convention), the period splits at the calendar midpoint
  * of the observed day range (min + (max−min) div 2; post = later
  * half), outcomes are cent-quantized values. DiD = (μ_T,post −
  * μ_T,pre) − (μ_C,post − μ_C,pre) where every mean is ONE double
  * division of exact integers in identical operand order — the
  * estimator is bit-equal cross-engine with no rounding.
  *
  * **q_cohen_kappa** — chance-corrected agreement between the gold
  * `lang` label and the engine's own marker-word language-ID heuristic
  * (Text.langId — the q_lang_id component, so the kappa AUDITS an
  * existing operator): κ = (n·Σdiag − Σ_c r_c·p_c) / (n² − Σ_c r_c·p_c)
  * — the whole statistic one integer rational, no per-class doubles at
  * all. Int64 headroom: n² wraps past n ≈ 3e9 docs — past that run the
  * two products in Decimal(38,0) (documented knob).
  *
  * Scale shape: q_did is one conditional hash aggregate (4 logical
  * cells folded into one group) plus a broadcast 1-row day-bounds
  * aggregate; q_cohen_kappa is two |classes|-row marginal aggregates
  * joined on class plus one global count — every shuffle carries
  * partial-aggregate rows only.
  */
object Breadth144 {

  /** The 2×2 DiD table + estimate (one row). */
  private[graft] def did(events: DataFrame): DataFrame = {
    val base = events.select(
      (col("user_id") % 2 === 0).as("__treat"),
      to_date(col("ts")).as("__day"),
      floor(col("value") * 100 + lit(0.5)).cast("long").as("__vc"))
    val bounds = base.agg(min(col("__day")).as("__d0"),
        max(col("__day")).as("__d1"))
      .select(col("__d0"), col("__d1"),
        date_add(col("__d0"),
          floor(datediff(col("__d1"), col("__d0")).cast("double") / 2)
            .cast("int")).as("__mid"))
    def cellN(t: Boolean, p: Boolean) =
      sum(when(col("__treat") === t && col("__post") === p, 1L)
        .otherwise(0L))
    def cellS(t: Boolean, p: Boolean) =
      sum(when(col("__treat") === t && col("__post") === p, col("__vc"))
        .otherwise(0L))
    def mean(s: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      s.cast("double") / (lit(100.0) * n.cast("double"))
    base.crossJoin(broadcast(bounds))
      .withColumn("__post", col("__day") > col("__mid"))
      .agg(
        cellN(t = true, p = false).as("n_t_pre"),
        cellN(t = true, p = true).as("n_t_post"),
        cellN(t = false, p = false).as("n_c_pre"),
        cellN(t = false, p = true).as("n_c_post"),
        cellS(t = true, p = false).as("__s_t_pre"),
        cellS(t = true, p = true).as("__s_t_post"),
        cellS(t = false, p = false).as("__s_c_pre"),
        cellS(t = false, p = true).as("__s_c_post"))
      .select(
        col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
        mean(col("__s_t_pre"), col("n_t_pre")).as("mean_t_pre"),
        mean(col("__s_t_post"), col("n_t_post")).as("mean_t_post"),
        mean(col("__s_c_pre"), col("n_c_pre")).as("mean_c_pre"),
        mean(col("__s_c_post"), col("n_c_post")).as("mean_c_post"),
        ((mean(col("__s_t_post"), col("n_t_post"))
          - mean(col("__s_t_pre"), col("n_t_pre")))
          - (mean(col("__s_c_post"), col("n_c_post"))
            - mean(col("__s_c_pre"), col("n_c_pre")))).as("did"))
  }

  /** Cohen's kappa of gold lang vs the marker-word heuristic. */
  private[graft] def cohenKappa(docs: DataFrame): DataFrame = {
    val preds = docs.select(col("lang"),
      graft.text.Text.langId(col("text")).as("__pred"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = preds.agg(count(lit(1)).as("n"),
      sum(when(col("lang") === col("__pred"), 1L).otherwise(0L))
        .as("n_agree"))
    val r = preds.groupBy(col("lang").as("__c")).agg(count(lit(1)).as("__r"))
    val p = preds.groupBy(col("__pred").as("__c"))
      .agg(count(lit(1)).as("__p"))
    val srp = r.join(p, Seq("__c"))
      .agg(coalesce(sum(col("__r") * col("__p")), lit(0L)).as("__srp"))
    tot.crossJoin(broadcast(srp))
      .select(col("n"), col("n_agree"),
        (col("n_agree").cast("double") / col("n").cast("double")).as("po"),
        (col("__srp").cast("double")
          / (col("n").cast("double") * col("n").cast("double"))).as("pe"),
        ((col("n") * col("n_agree") - col("__srp")).cast("double")
          / (col("n") * col("n") - col("__srp")).cast("double"))
          .as("kappa"))
  }

  val defs: Map[String, Q] = Map(
    "q_did" -> ((s, dir) => did(Tables.events(s, dir))),
    "q_cohen_kappa" -> ((s, dir) => cohenKappa(Tables.documents(s, dir))))

  val oracle: Map[String, String] = Map(
    "q_did" ->
      """WITH base AS (
        |  SELECT user_id % 2 = 0 AS treat, CAST(ts AS DATE) AS day,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
        |  FROM events),
        |bounds AS (
        |  SELECT min(day) AS d0, max(day) AS d1,
        |    min(day) + CAST((max(day) - min(day)) // 2 AS INTEGER) AS mid
        |  FROM base),
        |cells AS (
        |  SELECT
        |    CAST(sum(CASE WHEN treat AND day <= mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_t_pre,
        |    CAST(sum(CASE WHEN treat AND day > mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_t_post,
        |    CAST(sum(CASE WHEN NOT treat AND day <= mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_c_pre,
        |    CAST(sum(CASE WHEN NOT treat AND day > mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_c_post,
        |    CAST(sum(CASE WHEN treat AND day <= mid THEN vc ELSE 0 END)
        |      AS BIGINT) AS s_t_pre,
        |    CAST(sum(CASE WHEN treat AND day > mid THEN vc ELSE 0 END)
        |      AS BIGINT) AS s_t_post,
        |    CAST(sum(CASE WHEN NOT treat AND day <= mid THEN vc ELSE 0 END)
        |      AS BIGINT) AS s_c_pre,
        |    CAST(sum(CASE WHEN NOT treat AND day > mid THEN vc ELSE 0 END)
        |      AS BIGINT) AS s_c_post
        |  FROM base CROSS JOIN bounds)
        |SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
        |  CAST(s_t_pre AS DOUBLE) / (100.0 * CAST(n_t_pre AS DOUBLE))
        |    AS mean_t_pre,
        |  CAST(s_t_post AS DOUBLE) / (100.0 * CAST(n_t_post AS DOUBLE))
        |    AS mean_t_post,
        |  CAST(s_c_pre AS DOUBLE) / (100.0 * CAST(n_c_pre AS DOUBLE))
        |    AS mean_c_pre,
        |  CAST(s_c_post AS DOUBLE) / (100.0 * CAST(n_c_post AS DOUBLE))
        |    AS mean_c_post,
        |  (CAST(s_t_post AS DOUBLE) / (100.0 * CAST(n_t_post AS DOUBLE))
        |   - CAST(s_t_pre AS DOUBLE) / (100.0 * CAST(n_t_pre AS DOUBLE)))
        |  - (CAST(s_c_post AS DOUBLE) / (100.0 * CAST(n_c_post AS DOUBLE))
        |   - CAST(s_c_pre AS DOUBLE) / (100.0 * CAST(n_c_pre AS DOUBLE)))
        |  AS did
        |FROM cells""".stripMargin,

    "q_cohen_kappa" ->
      s"""WITH ${Extensions.langPredSql},
         |tot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_agree
         |  FROM pred),
         |rm AS (SELECT lang AS c, CAST(count(*) AS BIGINT) AS r
         |       FROM pred GROUP BY lang),
         |pm AS (SELECT pred_lang AS c, CAST(count(*) AS BIGINT) AS p
         |       FROM pred GROUP BY pred_lang),
         |srp AS (
         |  SELECT CAST(coalesce(sum(rm.r * pm.p), 0) AS BIGINT) AS srp
         |  FROM rm JOIN pm ON rm.c = pm.c)
         |SELECT n, n_agree,
         |  CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
         |  CAST(srp AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
         |    AS pe,
         |  CAST(n * n_agree - srp AS DOUBLE)
         |    / CAST(n * n - srp AS DOUBLE) AS kappa
         |FROM tot CROSS JOIN srp""".stripMargin)
}
