package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-seventy-second wave — ISOTONIC CALIBRATION of the pseudo-
  * probability score, via the exact MINIMAX closed form of isotonic
  * regression: ŷ_k = max_{i≤k} min_{j≥k} weightedAvg(pos, i..j). No
  * sequential pool-adjacent-violators loop — the minimax is a finite
  * lattice of interval averages, exactly computable in both engines
  * (and the classical proof says it EQUALS the PAVA solution).
  *
  *  - **q_isotonic_calibration**: per calibration bin (the wave-139
  *    decile convention: p = (n_chars mod 101)/101, y = lang='en') —
  *    raw empirical rate and the isotonic (monotone-nondecreasing)
  *    calibrated rate.
  *  - **q_calibration_error**: one row — expected calibration error
  *    before (|mean_p − rate|) and after (|mean_p − iso_rate|)
  *    isotonic fitting, plus the count of adjacent monotonicity
  *    violations the fit removed.
  *
  * Exact-parity discipline: interval averages are ONE double division
  * of exact integer prefix sums; max/min over those divisions are
  * order-free; ECE terms quantize n_k·|Δ| to integer 1e-9 units
  * before the BIGINT sum (mean_p reuses the wave-139 1e-6 row
  * quantization). Int64 headroom: terms ≤ n_k·1e9 ≤ 5e13 at sf0.1.
  *
  * Scale shape: one corpus hash aggregate to ≤ 10 bins; the minimax
  * lattice is bins³ ≤ 1000 rows — metadata-sized. The number of bins,
  * not the corpus, is the only driver past the first aggregate.
  */
object Breadth171 {

  private[graft] val CalibMod = 101L

  /** The calibration bins with prefix sums (internal). */
  private[graft] def bins(docs: DataFrame): DataFrame = {
    val p = (col("n_chars") % CalibMod).cast("double") /
      lit(CalibMod.toDouble)
    val y = when(col("lang") === "en", 1L).otherwise(0L)
    val b = docs
      .select(least(floor(p * lit(10)).cast("long"), lit(9L)).as("bin"),
        floor(p * lit(1.0e6) + lit(0.5)).cast("long").as("__pq"),
        y.as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"),
        sum(col("__pq")).as("__sp"))
    val w = Window.orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn("__cpos", sum(col("pos")).over(w))
      .withColumn("__cn", sum(col("n")).over(w))
      .withColumn("__epos", col("__cpos") - col("pos"))
      .withColumn("__en", col("__cn") - col("n"))
  }

  /** Bins + the minimax isotonic rate (internal). */
  private[graft] def isotonic(docs: DataFrame): DataFrame = {
    val b = bins(docs)
    val iEnd = b.select(col("bin").as("__i"), col("__epos"), col("__en"))
    val jEnd = b.select(col("bin").as("__j"), col("__cpos"), col("__cn"))
    val intervals = iEnd.crossJoin(jEnd).filter(col("__i") <= col("__j"))
      .select(col("__i"), col("__j"),
        ((col("__cpos") - col("__epos")).cast("double") /
          (col("__cn") - col("__en")).cast("double")).as("__avg"))
    val ks = b.select(col("bin").as("__k"))
    val minJ = ks.crossJoin(intervals)
      .filter(col("__i") <= col("__k") && col("__j") >= col("__k"))
      .groupBy(col("__k"), col("__i"))
      .agg(min(col("__avg")).as("__minj"))
    val iso = minJ.groupBy(col("__k"))
      .agg(max(col("__minj")).as("iso_rate"))
      .select(col("__k").as("bin"), col("iso_rate"))
    b.join(iso, Seq("bin"))
      .select(col("bin"), col("n"), col("pos"),
        (col("__sp").cast("double") /
          (lit(1.0e6) * col("n").cast("double"))).as("mean_p"),
        (col("pos").cast("double") / col("n").cast("double"))
          .as("pos_rate"),
        col("iso_rate"))
  }

  private[graft] def isotonicCalibration(docs: DataFrame): DataFrame =
    isotonic(docs).orderBy(col("bin").asc)

  /** ECE before/after + removed monotone violations. */
  private[graft] def calibrationError(docs: DataFrame): DataFrame = {
    val t = isotonic(docs)
    val lagW = Window.orderBy(col("bin").asc)
    t.withColumn("__prev", lag(col("pos_rate"), 1).over(lagW))
      .withColumn("__eceRaw",
        floor(col("n").cast("double") *
          abs(col("mean_p") - col("pos_rate")) * lit(1.0e9) + lit(0.5))
          .cast("long"))
      .withColumn("__eceIso",
        floor(col("n").cast("double") *
          abs(col("mean_p") - col("iso_rate")) * lit(1.0e9) + lit(0.5))
          .cast("long"))
      .agg(sum(col("n")).as("n"),
        sum(col("__eceRaw")).as("__sr"), sum(col("__eceIso")).as("__si"),
        sum(when(col("__prev").isNotNull &&
          col("pos_rate") < col("__prev"), 1L).otherwise(0L))
          .as("violations_raw"))
      .select(col("n"),
        (col("__sr").cast("double") /
          (col("n") * lit(1000000000L)).cast("double")).as("ece_raw"),
        (col("__si").cast("double") /
          (col("n") * lit(1000000000L)).cast("double")).as("ece_iso"),
        col("violations_raw"))
  }

  val defs: Map[String, Q] = Map(
    "q_isotonic_calibration" -> ((s, dir) =>
      isotonicCalibration(Tables.documents(s, dir))),
    "q_calibration_error" -> ((s, dir) =>
      calibrationError(Tables.documents(s, dir))))

  /** Bin + minimax CTE chain (no leading WITH), shared. */
  private val IsoSql: String =
    s"""rows0 AS (
       |  SELECT least(CAST(floor(CAST(n_chars % $CalibMod AS DOUBLE)
       |      / ${CalibMod}.0 * 10) AS BIGINT), 9) AS bin,
       |    CAST(floor(CAST(n_chars % $CalibMod AS DOUBLE)
       |      / ${CalibMod}.0 * 1.0e6 + 0.5) AS BIGINT) AS pq,
       |    CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
       |      ELSE CAST(0 AS BIGINT) END AS y
       |  FROM documents),
       |b AS (
       |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(y) AS BIGINT) AS pos,
       |    CAST(sum(pq) AS BIGINT) AS sp
       |  FROM rows0 GROUP BY bin),
       |pre AS (
       |  SELECT bin, n, pos, sp,
       |    CAST(sum(pos) OVER (ORDER BY bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cpos,
       |    CAST(sum(n) OVER (ORDER BY bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cn
       |  FROM b),
       |iv AS (
       |  SELECT i.bin AS i, j.bin AS j,
       |    CAST(j.cpos - (i.cpos - i.pos) AS DOUBLE)
       |      / CAST(j.cn - (i.cn - i.n) AS DOUBLE) AS avg
       |  FROM pre i CROSS JOIN pre j WHERE i.bin <= j.bin),
       |mj AS (
       |  SELECT k.bin AS k, iv.i, min(iv.avg) AS minj
       |  FROM pre k JOIN iv ON iv.i <= k.bin AND iv.j >= k.bin
       |  GROUP BY k.bin, iv.i),
       |iso AS (
       |  SELECT k AS bin, max(minj) AS iso_rate FROM mj GROUP BY k),
       |tbl AS (
       |  SELECT pre.bin, pre.n, pre.pos,
       |    CAST(pre.sp AS DOUBLE) / (1.0e6 * CAST(pre.n AS DOUBLE))
       |      AS mean_p,
       |    CAST(pre.pos AS DOUBLE) / CAST(pre.n AS DOUBLE) AS pos_rate,
       |    iso.iso_rate
       |  FROM pre JOIN iso ON pre.bin = iso.bin)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_isotonic_calibration" ->
      s"""WITH $IsoSql
         |SELECT bin, n, pos, mean_p, pos_rate, iso_rate
         |FROM tbl
         |ORDER BY bin""".stripMargin,

    "q_calibration_error" ->
      s"""WITH $IsoSql,
         |lagged AS (
         |  SELECT *, lag(pos_rate) OVER (ORDER BY bin) AS prev
         |  FROM tbl)
         |SELECT CAST(sum(n) AS BIGINT) AS n,
         |  CAST(sum(CAST(floor(CAST(n AS DOUBLE) * abs(mean_p - pos_rate)
         |      * 1.0e9 + 0.5) AS BIGINT)) AS DOUBLE)
         |    / CAST(sum(n) * 1000000000 AS DOUBLE) AS ece_raw,
         |  CAST(sum(CAST(floor(CAST(n AS DOUBLE) * abs(mean_p - iso_rate)
         |      * 1.0e9 + 0.5) AS BIGINT)) AS DOUBLE)
         |    / CAST(sum(n) * 1000000000 AS DOUBLE) AS ece_iso,
         |  CAST(sum(CASE WHEN prev IS NOT NULL AND pos_rate < prev
         |    THEN 1 ELSE 0 END) AS BIGINT) AS violations_raw
         |FROM lagged""".stripMargin)
}
