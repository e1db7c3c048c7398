package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-sixtieth wave — the two classifier-eval tables wave 139
  * left on the shelf, closing out the model-quality tier:
  *
  *  - **q_lift_deciles**: the gains chart — rank the corpus by the
  *    deterministic document score (n_chars DESC, the same classifier
  *    under evaluation as q_auc/q_avg_precision), cut into exact rank
  *    deciles, and emit per-decile capture: positive rate, cumulative
  *    gain share, and lift vs the base rate. The table that answers
  *    "how much of the good data do the top-k% of scores buy".
  *  - **q_brier_decomp**: the Murphy decomposition of the Brier score
  *    for the pseudo-probability p = (n_chars mod 101)/101 vs
  *    y = (lang = 'en') over the q_calibration decile bins —
  *    reliability (calibration error), resolution (discrimination),
  *    uncertainty (base-rate entropy), and the within-bin residual
  *    brier − (rel − res + unc) (zero only for bin-constant
  *    forecasts — emitted so the approximation is visible, not
  *    silent).
  *
  * Exact-parity discipline: deciles come from the exact rank formula
  * ((rk−1)·10) div n over a total order (score DESC, doc_id ASC);
  * lift = (pos_k·n)/(n_k·pos) is one double division of exact integer
  * products (headroom n² ≈ 2.5e9 at sf0.1); Brier terms reuse wave
  * 139's 1e-12/1e-6 row quantizations, and each bin's reliability/
  * resolution term is quantized to integer 1e-12 units before the
  * order-free BIGINT sum (a 10-double sum would be accumulation-order
  * dependent across engines).
  *
  * Scale shape: one rank window (documented approx-quantile swap at
  * 100 TB, as wave 152) + hash aggregates; the decomposition grid is
  * 10 bins — metadata-sized after the per-bin aggregate.
  */
object Breadth159 {

  private[graft] val CalibMod = 101L

  /** Gains/lift table over exact score-rank deciles. */
  private[graft] def liftDeciles(docs: DataFrame): DataFrame = {
    val w = Window.orderBy(col("n_chars").desc, col("doc_id").asc)
    val n = docs.agg(count(lit(1)).as("__n"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("__tp"))
    val per = docs
      .select(col("doc_id"), col("n_chars"),
        when(col("lang") === "en", 1L).otherwise(0L).as("__y"))
      .withColumn("__rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(n))
      .withColumn("decile", expr("((__rk - 1) * 10) div __n"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__y")).as("n_pos"),
        first(col("__n")).as("__n"), first(col("__tp")).as("__tp"))
    val cum = Window.orderBy(col("decile").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per
      .withColumn("cum_pos", sum(col("n_pos")).over(cum))
      .select(col("decile"), col("n_rows"), col("n_pos"),
        (col("n_pos").cast("double") / col("n_rows").cast("double"))
          .as("pos_rate"),
        (col("cum_pos").cast("double") / col("__tp").cast("double"))
          .as("cum_gain"),
        ((col("n_pos") * col("__n")).cast("double") /
          (col("n_rows") * col("__tp")).cast("double")).as("lift"))
      .orderBy(col("decile").asc)
  }

  /** One-row Murphy decomposition of the Brier score. */
  private[graft] def brierDecomp(docs: DataFrame): DataFrame = {
    val p = (col("n_chars") % CalibMod).cast("double") /
      lit(CalibMod.toDouble)
    val y = when(col("lang") === "en", 1L).otherwise(0L)
    val bins = docs
      .select(
        least(floor(p * lit(10)).cast("long"), lit(9L)).as("bin"),
        floor(p * lit(1.0e6) + lit(0.5)).cast("long").as("__pq"),
        y.as("__y"),
        floor((p - y.cast("double")) * (p - y.cast("double"))
          * lit(1.0e12) + lit(0.5)).cast("long").as("__bq"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("__nk"), sum(col("__y")).as("__pk"),
        sum(col("__pq")).as("__sp"), sum(col("__bq")).as("__sb"))
    val tot = bins.agg(sum(col("__nk")).as("__n"), sum(col("__pk")).as("__tp"))
    val terms = bins.crossJoin(broadcast(tot))
      .withColumn("__meanp",
        col("__sp").cast("double") /
          (lit(1.0e6) * col("__nk").cast("double")))
      .withColumn("__ratek",
        col("__pk").cast("double") / col("__nk").cast("double"))
      .withColumn("__rate",
        col("__tp").cast("double") / col("__n").cast("double"))
      .withColumn("__rel",
        floor(col("__nk").cast("double")
          * (col("__meanp") - col("__ratek"))
          * (col("__meanp") - col("__ratek"))
          * lit(1.0e12) + lit(0.5)).cast("long"))
      .withColumn("__res",
        floor(col("__nk").cast("double")
          * (col("__ratek") - col("__rate"))
          * (col("__ratek") - col("__rate"))
          * lit(1.0e12) + lit(0.5)).cast("long"))
    terms
      .groupBy()
      .agg(first(col("__n")).as("n"), first(col("__rate")).as("__r"),
        sum(col("__sb")).as("__sbt"), sum(col("__rel")).as("__relt"),
        sum(col("__res")).as("__rest"))
      .select(col("n"),
        (col("__sbt").cast("double") /
          (lit(1.0e12) * col("n").cast("double"))).as("brier"),
        (col("__relt").cast("double") /
          (lit(1.0e12) * col("n").cast("double"))).as("reliability"),
        (col("__rest").cast("double") /
          (lit(1.0e12) * col("n").cast("double"))).as("resolution"),
        (col("__r") * (lit(1.0) - col("__r"))).as("uncertainty"))
      .withColumn("residual",
        col("brier") -
          (col("reliability") - col("resolution") + col("uncertainty")))
  }

  val defs: Map[String, Q] = Map(
    "q_lift_deciles" -> ((s, dir) => liftDeciles(Tables.documents(s, dir))),
    "q_brier_decomp" -> ((s, dir) => brierDecomp(Tables.documents(s, dir))))

  val oracle: Map[String, String] = Map(
    "q_lift_deciles" ->
      """WITH nn AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS tp
        |  FROM documents),
        |ranked AS (
        |  SELECT CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS y,
        |    ((CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
        |      AS BIGINT) - 1) * 10) // nn.n AS decile
        |  FROM documents CROSS JOIN nn),
        |per AS (
        |  SELECT decile, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(y) AS BIGINT) AS n_pos
        |  FROM ranked GROUP BY decile)
        |SELECT decile, n_rows, n_pos,
        |  CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE) AS pos_rate,
        |  CAST(sum(n_pos) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) / CAST(nn.tp AS DOUBLE) AS cum_gain,
        |  CAST(n_pos * nn.n AS DOUBLE)
        |    / CAST(n_rows * nn.tp AS DOUBLE) AS lift
        |FROM per CROSS JOIN nn
        |ORDER BY decile""".stripMargin,

    "q_brier_decomp" ->
      s"""WITH rows0 AS (
         |  SELECT least(CAST(floor((CAST(n_chars % $CalibMod AS DOUBLE)
         |      / ${CalibMod}.0) * 10) AS BIGINT), 9) AS bin,
         |    CAST(floor((CAST(n_chars % $CalibMod AS DOUBLE)
         |      / ${CalibMod}.0) * 1.0e6 + 0.5) AS BIGINT) AS pq,
         |    CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
         |      ELSE CAST(0 AS BIGINT) END AS y,
         |    CAST(floor(
         |      ((CAST(n_chars % $CalibMod AS DOUBLE) / ${CalibMod}.0)
         |        - CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END)
         |      * ((CAST(n_chars % $CalibMod AS DOUBLE) / ${CalibMod}.0)
         |        - CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END)
         |      * 1.0e12 + 0.5) AS BIGINT) AS bq
         |  FROM documents),
         |bins AS (
         |  SELECT bin, CAST(count(*) AS BIGINT) AS nk,
         |    CAST(sum(y) AS BIGINT) AS pk,
         |    CAST(sum(pq) AS BIGINT) AS sp,
         |    CAST(sum(bq) AS BIGINT) AS sb
         |  FROM rows0 GROUP BY bin),
         |tot AS (
         |  SELECT CAST(sum(nk) AS BIGINT) AS n,
         |    CAST(sum(pk) AS BIGINT) AS tp FROM bins),
         |terms AS (
         |  SELECT nk, sb,
         |    CAST(sp AS DOUBLE) / (1.0e6 * CAST(nk AS DOUBLE)) AS meanp,
         |    CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE) AS ratek,
         |    CAST(tot.tp AS DOUBLE) / CAST(tot.n AS DOUBLE) AS rate,
         |    tot.n AS n
         |  FROM bins CROSS JOIN tot),
         |qterms AS (
         |  SELECT n, sb,
         |    CAST(floor(CAST(nk AS DOUBLE) * (meanp - ratek)
         |      * (meanp - ratek) * 1.0e12 + 0.5) AS BIGINT) AS rel,
         |    CAST(floor(CAST(nk AS DOUBLE) * (ratek - rate)
         |      * (ratek - rate) * 1.0e12 + 0.5) AS BIGINT) AS res,
         |    rate
         |  FROM terms)
         |SELECT n,
         |  CAST(sum(sb) AS DOUBLE) / (1.0e12 * CAST(n AS DOUBLE)) AS brier,
         |  CAST(sum(rel) AS DOUBLE) / (1.0e12 * CAST(n AS DOUBLE))
         |    AS reliability,
         |  CAST(sum(res) AS DOUBLE) / (1.0e12 * CAST(n AS DOUBLE))
         |    AS resolution,
         |  rate * (1.0 - rate) AS uncertainty,
         |  (CAST(sum(sb) AS DOUBLE) / (1.0e12 * CAST(n AS DOUBLE)))
         |    - ((CAST(sum(rel) AS DOUBLE) / (1.0e12 * CAST(n AS DOUBLE)))
         |      - (CAST(sum(res) AS DOUBLE) / (1.0e12 * CAST(n AS DOUBLE)))
         |      + rate * (1.0 - rate)) AS residual
         |FROM qterms
         |GROUP BY n, rate""".stripMargin)
}
