package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-fifty-ninth wave — the FEATURE-ENCODING pair every tabular
  * training pipeline runs before a model sees a categorical column:
  *
  *  - **q_woe_iv**: weight-of-evidence binning of the quantity bucket
  *    against the "returned" outcome (l_returnflag = 'R'), with the
  *    information value of the feature. WOE_i =
  *    ln((bad_i/bad)/(good_i/good)); IV = Σ (bad_i/bad − good_i/good)
  *    ·WOE_i — the scorecard-industry screen for "is this feature
  *    worth keeping" (IV < 0.02 = useless, > 0.5 = suspicious).
  *  - **q_target_encode**: m-estimate smoothed mean-target encoding of
  *    the supplier key — enc_s = (bad_s + m·prior)/(n_s + m), the
  *    high-cardinality-safe replacement for one-hot.
  *
  * Exact-parity discipline: WOE's log argument is ONE division of
  * exact integer products (bad_i·good − good_i·bad ≤ n² ≈ 3.6e11 at
  * sf0.1 — int64 headroom to n ≈ 3e9 rows); the emitted WOE is rounded
  * to 6 dp on both engines (libm 1-ulp rule); IV terms multiply the
  * ROUNDED woe by an exact share difference and are quantized to
  * integer 1e-9 units before the order-free BIGINT sum. The target
  * encoding is rearranged to the exact rational form
  * (bad_s·n + m·bad)/((n_s + m)·n) — one double division, no float
  * accumulation.
  *
  * Scale shape: two hash aggregates (bucket and supplier) plus one
  * broadcast of the 1-row totals — partial-aggregate shuffles only;
  * the supplier table is top-15 by volume (TakeOrdered), never a full
  * sort.
  */
object Breadth158 {

  private[graft] val M = 20L // m-estimate smoothing pseudo-count
  private[graft] val TopSupp = 15

  /** WOE per quantity bucket + the feature's information value. */
  private[graft] def woeIv(lineitem: DataFrame): DataFrame = {
    val tagged = lineitem.select(
      floor((col("l_quantity") - 1) / 10).cast("long").as("bucket_id"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("__bad"))
    val bins = tagged.groupBy(col("bucket_id"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__bad")).as("n_bad"))
      .withColumn("__good", col("n_rows") - col("n_bad"))
    val tot = bins.agg(sum(col("n_bad")).as("__tb"),
      sum(col("__good")).as("__tg"))
    val scored = bins.crossJoin(broadcast(tot))
      .withColumn("woe",
        when(col("n_bad") === 0 || col("__good") === 0, lit(null))
          .otherwise(round(log(
            (col("n_bad") * col("__tg")).cast("double") /
              (col("__good") * col("__tb")).cast("double")), 6)))
      .withColumn("__term",
        when(col("woe").isNull, lit(0L))
          .otherwise(floor(
            (col("n_bad").cast("double") / col("__tb").cast("double") -
              col("__good").cast("double") / col("__tg").cast("double"))
              * col("woe") * 1e9 + 0.5).cast("long")))
    scored
      .withColumn("iv",
        (sum(col("__term")).over(Window.partitionBy()).cast("double") /
          lit(1.0e9)))
      .select(col("bucket_id"), col("n_rows"), col("n_bad"), col("woe"),
        col("iv"))
      .orderBy(col("bucket_id").asc)
  }

  /** m-estimate target encoding of the supplier key (top-15 by volume). */
  private[graft] def targetEncode(lineitem: DataFrame): DataFrame = {
    val tagged = lineitem.select(col("l_suppkey"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("__bad"))
    val per = tagged.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__bad")).as("n_bad"))
    val tot = tagged.agg(count(lit(1)).as("__n"),
      sum(col("__bad")).as("__tb"))
    per.crossJoin(broadcast(tot))
      .select(col("l_suppkey"), col("n_rows"), col("n_bad"),
        ((col("n_bad") * col("__n") + lit(M) * col("__tb")).cast("double") /
          ((col("n_rows") + lit(M)) * col("__n")).cast("double"))
          .as("enc"),
        (col("__tb").cast("double") / col("__n").cast("double"))
          .as("prior"))
      .orderBy(col("n_rows").desc, col("l_suppkey").asc)
      .limit(TopSupp)
  }

  val defs: Map[String, Q] = Map(
    "q_woe_iv" -> ((s, dir) => woeIv(Tables.lineitem(s, dir))),
    "q_target_encode" -> ((s, dir) => targetEncode(Tables.lineitem(s, dir))))

  val oracle: Map[String, String] = Map(
    "q_woe_iv" ->
      s"""WITH tagged AS (
         |  SELECT CAST(floor((l_quantity - 1) / 10) AS BIGINT)
         |      AS bucket_id,
         |    CASE WHEN l_returnflag = 'R' THEN CAST(1 AS BIGINT)
         |      ELSE CAST(0 AS BIGINT) END AS bad
         |  FROM lineitem),
         |bins AS (
         |  SELECT bucket_id, CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(sum(bad) AS BIGINT) AS n_bad,
         |    CAST(count(*) - sum(bad) AS BIGINT) AS good
         |  FROM tagged GROUP BY bucket_id),
         |tot AS (
         |  SELECT CAST(sum(n_bad) AS BIGINT) AS tb,
         |    CAST(sum(good) AS BIGINT) AS tg FROM bins),
         |scored AS (
         |  SELECT bucket_id, n_rows, n_bad,
         |    CASE WHEN n_bad = 0 OR good = 0 THEN NULL
         |      ELSE round(ln(CAST(n_bad * tg AS DOUBLE)
         |        / CAST(good * tb AS DOUBLE)), 6) END AS woe,
         |    CASE WHEN n_bad = 0 OR good = 0 THEN CAST(0 AS BIGINT)
         |      ELSE CAST(floor(
         |        (CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE)
         |          - CAST(good AS DOUBLE) / CAST(tg AS DOUBLE))
         |        * round(ln(CAST(n_bad * tg AS DOUBLE)
         |          / CAST(good * tb AS DOUBLE)), 6) * 1.0e9 + 0.5)
         |        AS BIGINT) END AS term
         |  FROM bins CROSS JOIN tot)
         |SELECT bucket_id, n_rows, n_bad, woe,
         |  CAST(sum(term) OVER () AS DOUBLE) / 1.0e9 AS iv
         |FROM scored
         |ORDER BY bucket_id""".stripMargin,

    "q_target_encode" ->
      s"""WITH tagged AS (
         |  SELECT l_suppkey,
         |    CASE WHEN l_returnflag = 'R' THEN CAST(1 AS BIGINT)
         |      ELSE CAST(0 AS BIGINT) END AS bad
         |  FROM lineitem),
         |per AS (
         |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(sum(bad) AS BIGINT) AS n_bad
         |  FROM tagged GROUP BY l_suppkey),
         |tot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(bad) AS BIGINT) AS tb FROM tagged)
         |SELECT l_suppkey, n_rows, n_bad,
         |  CAST(n_bad * n + $M * tb AS DOUBLE)
         |    / CAST((n_rows + $M) * n AS DOUBLE) AS enc,
         |  CAST(tb AS DOUBLE) / CAST(n AS DOUBLE) AS prior
         |FROM per CROSS JOIN tot
         |ORDER BY n_rows DESC, l_suppkey
         |LIMIT $TopSupp""".stripMargin)
}
