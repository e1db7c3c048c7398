package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hundred-fifty-fifth wave — HYPERLOGLOG FROM SCRATCH: the 64-register
  * HLL over the corpus token stream, built from engine-portable md5
  * bits so the DIFFERENTIAL ORACLE REPLAYS THE SKETCH EXACTLY (the
  * q_approx_distinct line audits Spark's builtin against a tolerance;
  * this wave owns the estimator itself — registers, harmonic mean,
  * estimate — as replayable arithmetic, the way the AMS wave owns F₂).
  *
  * Determinism end to end:
  *  - bucket = md5[1..15] mod 64, evidence v = md5[17..31] as a 60-bit
  *    integer (the house split-hash convention);
  *  - ρ(v) = position of the leftmost 1-bit in 60 bits = a GENERATED
  *    61-arm integer-comparison CASE (the same SQL string runs in both
  *    engines — no log2/bit tricks, no libm);
  *  - registers r_b = max ρ per bucket (mergeable by max — the
  *    warehouse merge is register-wise max, same as the AMS sum);
  *  - the harmonic denominator Σ 2^(−r) sums EXACT DYADICS: each term
  *    is 1.0/(1<<r) (an exact power of two) and the 64-term sum spans
  *    ≤ 52 bits, so float addition never rounds — order-free without
  *    quantization;
  *  - estimate = α₆₄·64²/Σ with α₆₄ = 0.7213/(1 + 1.079/64) computed
  *    once in Scala and interpolated into both engines.
  * The small-range (linear-counting) and large-range corrections are
  * documented knobs, deliberately NOT applied: the emitted raw
  * estimate is the replayable core; corrections are one CASE on top.
  *
  * Scale shape: one map pass (bucket, ρ) + a 64-group max aggregate —
  * mergeable, bounded state, no shuffle of token identity; the exact
  * distinct companion (the thing HLL replaces) is the gate-SF oracle.
  */
object Breadth154 {

  private[graft] val HllM = 64
  private[graft] val Alpha64: Double = 0.7213 / (1.0 + 1.079 / 64.0)

  /** The shared 61-arm leftmost-1-bit CASE over a 60-bit int column —
    * one SQL string, both engines. */
  private[graft] def rhoCase(col: String): String =
    (1 to 60).map(k => s"WHEN $col >= ${1L << (60 - k)} THEN $k")
      .mkString("CASE ", " ", " ELSE 61 END")

  /** (bucket, register) rows for filled buckets. */
  private[graft] def hllRegisters(docs: DataFrame): DataFrame =
    docs.select(explode(graft.text.Text.tokens(col("text"))).as("tok"))
      .select(
        pmod(conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"),
          lit(HllM.toLong)).as("bucket"),
        conv(substring(md5(col("tok")), 17, 15), 16, 10).cast("long")
          .as("__v"))
      .withColumn("__rho", expr(rhoCase("__v")).cast("long"))
      .groupBy(col("bucket"))
      .agg(max(col("__rho")).as("register"))
      .orderBy(col("bucket").asc)

  /** One audit row: token/distinct counts, filled buckets, the raw
    * HLL estimate, and the estimate/exact ratio. */
  private[graft] def hllEstimate(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(explode(graft.text.Text.tokens(col("text"))).as("tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exact = toks.agg(count(lit(1)).as("n_tokens"),
      count_distinct(col("tok")).as("exact_distinct"))
    val regs = hllRegisters(docs)
      .agg(count(lit(1)).as("n_filled"),
        sum(lit(1.0) /
          expr("shiftleft(cast(1 as bigint), cast(register as int))"))
          .as("__sfilled"))
    exact.crossJoin(broadcast(regs))
      .select(col("n_tokens"), col("exact_distinct"), col("n_filled"),
        (lit(Alpha64 * HllM * HllM)
          / (col("__sfilled")
            + (lit(HllM.toLong) - col("n_filled")).cast("double")))
          .as("raw_est"))
      .withColumn("ratio",
        col("raw_est") / col("exact_distinct").cast("double"))
  }

  val defs: Map[String, Q] = Map(
    "q_hll_estimate" -> ((s, dir) => hllEstimate(Tables.documents(s, dir))),
    "q_hll_registers" -> ((s, dir) =>
      hllRegisters(Tables.documents(s, dir))))

  /** Token + register CTE chain (no leading WITH), shared. */
  private val HllSql: String =
    s"""toks AS (
       |  SELECT unnest(${Extensions.sqlTokens("text")}) AS tok
       |  FROM documents),
       |hv AS (
       |  SELECT
       |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % $HllM AS bucket,
       |    ('0x' || substr(md5(tok), 17, 15))::BIGINT AS v
       |  FROM toks),
       |regs AS (
       |  SELECT bucket, CAST(max(${rhoCase("v")}) AS BIGINT) AS register
       |  FROM hv GROUP BY bucket)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_hll_estimate" ->
      s"""WITH $HllSql,
         |ex AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct
         |  FROM toks),
         |ag AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_filled,
         |    sum(1.0 / CAST(CAST(1 AS BIGINT) << register AS DOUBLE))
         |      AS sfilled
         |  FROM regs)
         |SELECT n_tokens, exact_distinct, n_filled,
         |  ${Alpha64 * HllM * HllM}
         |    / (sfilled + CAST($HllM - n_filled AS DOUBLE)) AS raw_est,
         |  (${Alpha64 * HllM * HllM}
         |    / (sfilled + CAST($HllM - n_filled AS DOUBLE)))
         |    / CAST(exact_distinct AS DOUBLE) AS ratio
         |FROM ex CROSS JOIN ag""".stripMargin,

    "q_hll_registers" ->
      s"""WITH $HllSql
         |SELECT bucket, register FROM regs
         |ORDER BY bucket""".stripMargin)
}
