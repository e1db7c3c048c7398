package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hundred-sixty-fourth wave — SURVEY-SAMPLING estimator QC, the
  * machinery for auditing anything the pipeline estimates from a
  * sample instead of the full corpus:
  *
  *  - **q_horvitz_thompson**: the HT estimator of total quantity under
  *    a deterministic UNEQUAL-probability design — returned lines
  *    (l_returnflag = 'R') sampled at π = 1/2, the rest at π = 1/10,
  *    membership by the house md5 split-hash. T̂ = Σ y_i/π_i over the
  *    sample is design-unbiased however skewed the strata; the query
  *    emits T̂ next to the TRUE total (computable at gate SF) and the
  *    realized relative error.
  *  - **q_jackknife**: delete-one-group (supplier) leave-one-out
  *    ratios for R = revenue-cents / quantity, with Tukey
  *    pseudovalues — the nonparametric SE machinery for RATIO
  *    estimators, where naive per-row variance is wrong.
  *  - **q_jackknife_se**: the one-row jackknife summary — G, the full
  *    ratio, relative and absolute SE.
  *
  * Exact-parity discipline: sampling is md5-deterministic (15 hex
  * chars → 60-bit int, mod π⁻¹ — the wave-155 convention); T̂ and all
  * totals are exact BIGINTs (quantity integral, prices rebased to
  * cents via floor(p·100 + 0.5)); every ratio is ONE double division
  * of exact integers; the SE sums QUANTIZED relative deviations
  * (floor(dev·1e6 + 0.5), |dev| < 10 by the delete-one-of-G bound →
  * rq² ≤ 1e14, order-free BIGINT sum) and takes one IEEE-exact sqrt.
  *
  * Scale shape: HT is a map-side filter + one hash aggregate (the
  * whole point: the estimator never touches unsampled rows — at
  * 100 TB only the true-total companion column is dropped); the
  * jackknife reads ONE per-group aggregate and broadcasts the 1-row
  * totals — G leave-one-out ratios cost one pass, not G passes.
  */
object Breadth163 {

  private[graft] def centsCol(c: String): org.apache.spark.sql.Column =
    floor(col(c) * 100 + 0.5).cast("long")

  /** HT total-quantity estimate under the two-stratum design. */
  private[graft] def horvitzThompson(lineitem: DataFrame): DataFrame = {
    val key = concat(lit("ht#"), col("l_orderkey").cast("string"),
      lit("#"), col("l_linenumber").cast("string"))
    val h = conv(substring(md5(key), 1, 15), 16, 10).cast("long")
    val isR = col("l_returnflag") === "R"
    val sampled = when(isR, pmod(h, lit(2L)) === 0)
      .otherwise(pmod(h, lit(10L)) === 0)
    lineitem
      .select(isR.as("__r"), sampled.as("__in"),
        col("l_quantity").cast("long").as("__y"))
      .agg(count(lit(1)).as("n_pop"),
        sum(when(col("__in"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("__in") && col("__r"), 1L).otherwise(0L))
          .as("n_sampled_r"),
        sum(when(col("__in"),
          when(col("__r"), lit(2L)).otherwise(lit(10L)) * col("__y"))
          .otherwise(0L)).as("t_hat"),
        sum(col("__y")).as("t_true"))
      .select(col("n_pop"), col("n_sampled"), col("n_sampled_r"),
        col("t_hat"), col("t_true"),
        ((col("t_hat") - col("t_true")).cast("double") /
          col("t_true").cast("double")).as("rel_err"))
  }

  /** Per-group leave-one-out ratios + pseudovalues (internal base). */
  private[graft] def jackknifeGroups(lineitem: DataFrame): DataFrame = {
    val per = lineitem.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_rows"),
        sum(centsCol("l_extendedprice")).as("__sc"),
        sum(col("l_quantity").cast("long")).as("__sq"))
    val tot = per.agg(sum(col("__sc")).as("__tc"),
      sum(col("__sq")).as("__tq"), count(lit(1)).as("__g"))
    per.crossJoin(broadcast(tot))
      .withColumn("r_full",
        col("__tc").cast("double") / col("__tq").cast("double"))
      .withColumn("r_loo",
        when(col("__tq") - col("__sq") === 0, lit(null)).otherwise(
          (col("__tc") - col("__sc")).cast("double") /
            (col("__tq") - col("__sq")).cast("double")))
      .withColumn("pseudovalue",
        col("__g").cast("double") * col("r_full") -
          (col("__g") - 1).cast("double") * col("r_loo"))
      .withColumn("dev", col("r_loo") - col("r_full"))
  }

  private[graft] def jackknife(lineitem: DataFrame): DataFrame =
    jackknifeGroups(lineitem)
      .select(col("l_suppkey"), col("n_rows"), col("r_loo"),
        col("pseudovalue"), col("dev"))
      .orderBy(col("l_suppkey").asc)

  /** One-row jackknife SE summary (quantized relative deviations). */
  private[graft] def jackknifeSe(lineitem: DataFrame): DataFrame =
    jackknifeGroups(lineitem)
      .withColumn("__rq",
        floor((col("r_loo") / col("r_full") - lit(1.0)) * lit(1.0e6)
          + lit(0.5)).cast("long"))
      .agg(count(lit(1)).as("g"), first(col("r_full")).as("r_hat"),
        sum(col("__rq") * col("__rq")).as("__s2"))
      .select(col("g"), col("r_hat"),
        sqrt((col("g") - 1).cast("double") / col("g").cast("double") *
          (col("__s2").cast("double") / lit(1.0e12))).as("se_rel"))
      .withColumn("se_abs", col("se_rel") * col("r_hat"))

  val defs: Map[String, Q] = Map(
    "q_horvitz_thompson" -> ((s, dir) =>
      horvitzThompson(Tables.lineitem(s, dir))),
    "q_jackknife" -> ((s, dir) => jackknife(Tables.lineitem(s, dir))),
    "q_jackknife_se" -> ((s, dir) => jackknifeSe(Tables.lineitem(s, dir))))

  /** Jackknife group CTE chain (no leading WITH), shared. */
  private val JkSql: String =
    """per AS (
      |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_rows,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS sc,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
      |  FROM lineitem GROUP BY l_suppkey),
      |tot AS (
      |  SELECT CAST(sum(sc) AS BIGINT) AS tc,
      |    CAST(sum(sq) AS BIGINT) AS tq,
      |    CAST(count(*) AS BIGINT) AS g
      |  FROM per),
      |jk AS (
      |  SELECT per.l_suppkey, per.n_rows,
      |    CAST(tot.tc AS DOUBLE) / CAST(tot.tq AS DOUBLE) AS r_full,
      |    CASE WHEN tot.tq - per.sq = 0 THEN NULL
      |      ELSE CAST(tot.tc - per.sc AS DOUBLE)
      |        / CAST(tot.tq - per.sq AS DOUBLE) END AS r_loo,
      |    tot.g AS g
      |  FROM per CROSS JOIN tot)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_horvitz_thompson" ->
      """WITH t AS (
        |  SELECT l_returnflag = 'R' AS r,
        |    CASE WHEN l_returnflag = 'R'
        |      THEN ('0x' || substr(md5('ht#' || CAST(l_orderkey AS VARCHAR)
        |        || '#' || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT
        |        % 2 = 0
        |      ELSE ('0x' || substr(md5('ht#' || CAST(l_orderkey AS VARCHAR)
        |        || '#' || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT
        |        % 10 = 0 END AS sampled,
        |    CAST(l_quantity AS BIGINT) AS y
        |  FROM lineitem)
        |SELECT CAST(count(*) AS BIGINT) AS n_pop,
        |  CAST(sum(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_sampled,
        |  CAST(sum(CASE WHEN sampled AND r THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_sampled_r,
        |  CAST(sum(CASE WHEN sampled
        |    THEN (CASE WHEN r THEN 2 ELSE 10 END) * y
        |    ELSE 0 END) AS BIGINT) AS t_hat,
        |  CAST(sum(y) AS BIGINT) AS t_true,
        |  CAST(sum(CASE WHEN sampled
        |      THEN (CASE WHEN r THEN 2 ELSE 10 END) * y ELSE 0 END)
        |    - sum(y) AS DOUBLE) / CAST(sum(y) AS DOUBLE) AS rel_err
        |FROM t""".stripMargin,

    "q_jackknife" ->
      s"""WITH $JkSql
         |SELECT l_suppkey, n_rows, r_loo,
         |  CAST(g AS DOUBLE) * r_full
         |    - CAST(g - 1 AS DOUBLE) * r_loo AS pseudovalue,
         |  r_loo - r_full AS dev
         |FROM jk
         |ORDER BY l_suppkey""".stripMargin,

    "q_jackknife_se" ->
      s"""WITH $JkSql,
         |q AS (
         |  SELECT g, r_full,
         |    CAST(floor((r_loo / r_full - 1.0) * 1.0e6 + 0.5) AS BIGINT)
         |      AS rq
         |  FROM jk)
         |SELECT CAST(count(*) AS BIGINT) AS g, r_full AS r_hat,
         |  sqrt(CAST(count(*) - 1 AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    * (CAST(sum(rq * rq) AS DOUBLE) / 1.0e12)) AS se_rel,
         |  sqrt(CAST(count(*) - 1 AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    * (CAST(sum(rq * rq) AS DOUBLE) / 1.0e12)) * r_full AS se_abs
         |FROM q
         |GROUP BY r_full""".stripMargin)
}
