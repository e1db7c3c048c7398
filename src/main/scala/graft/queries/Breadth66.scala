package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixty-seventh wave — sequence entropy rate and distribution drift.
  *
  *  - **q_entropy_rate**: the first-order Markov entropy rate of
  *    per-user event-type sequences — H = −Σ_ij p(i,j)·log2 P(j|i)
  *    over consecutive-event transitions (per-user lag order, the
  *    q_transitions pair domain). The information-theoretic summary
  *    sitting above q_transitions' raw matrix and q_token_entropy's
  *    unigram view: how predictable is the next event given the
  *    current one. All counts exact; the ≤|types|² term sum runs as
  *    an ORDERED running window sum (same accumulation order in both
  *    engines) and the emitted bits are 6-dp-rounded (libm log2).
  *  - **q_psi**: Population Stability Index of the value distribution
  *    per event type, first half of the month (baseline) vs second
  *    (current) — the industry drift gauge next to q_ks_drift's
  *    supremum statistic. Fixed-width value bins (50-unit, capped at
  *    bin 9 — map-only, no global rank); a bin contributes only when
  *    BOTH sides observed it (the pinned zero-bin stance — no
  *    smoothing constant to tune), while the p/q denominators keep
  *    every observation of the side. Ordered running sum per type,
  *    6-dp emit.
  *
  * Scale shape: both are one map-side-combinable groupBy to a
  * types-bounded cell table plus windows over those cells only. */
object Breadth66 {

  private[graft] val PsiSplit = "2024-01-16"
  private[graft] val PsiBinWidth = 50.0
  private[graft] val PsiMaxBin = 9

  /** Markov entropy rate over `typeCol` transitions within each key's
    * (tsCol, idCol)-ordered sequence. */
  private[graft] def entropyRate(df: DataFrame, keyCol: String,
                                 tsCol: String, idCol: String,
                                 typeCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val pairs = df
      .withColumn("__prev", lag(col(typeCol), 1).over(byKey))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev"), col(typeCol).as("__next"))
      .agg(count(lit(1)).as("__c"))
    val wRow = Window.partitionBy(col("__prev"))
    val wAll = Window.partitionBy()
    val ordW = Window.orderBy(col("__prev").asc, col("__next").asc)
    pairs
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__ci", sum(col("__c")).over(wRow))
      .withColumn("__term",
        (col("__c").cast("double") / col("__n").cast("double")) *
          log2(col("__c").cast("double") / col("__ci").cast("double")))
      .withColumn("__h", sum(col("__term")).over(
        ordW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__rn", row_number().over(ordW))
      .withColumn("__cnt", count(lit(1)).over(wAll))
      .filter(col("__rn") === col("__cnt"))
      .crossJoin(broadcast(pairs.agg(
        countDistinct(col("__prev")).as("__states"))))
      .select(col("__n").as("n_transitions"),
        col("__states").as("n_states"),
        round(-col("__h"), 6).as("entropy_rate_bits"))
  }

  /** PSI per `typeCol` between the `split`-bounded halves of the data,
    * over fixed-width value bins. */
  private[graft] def psi(df: DataFrame, typeCol: String, tsCol: String,
                         valCol: String, split: String): DataFrame = {
    val cells = df
      .withColumn("__side",
        when(col(tsCol) < to_timestamp_ntz(lit(s"$split 00:00:00")), 0)
          .otherwise(1))
      .withColumn("__bin",
        least(floor(col(valCol) / lit(PsiBinWidth)).cast("int"),
          lit(PsiMaxBin)))
      .groupBy(col(typeCol), col("__bin"))
      .agg(sum(when(col("__side") === 0, 1L).otherwise(0L)).as("__cp"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("__cq"))
    val wType = Window.partitionBy(col(typeCol))
    val ordW = Window.partitionBy(col(typeCol)).orderBy(col("__bin").asc)
    cells
      .withColumn("__np", sum(col("__cp")).over(wType))
      .withColumn("__nq", sum(col("__cq")).over(wType))
      .withColumn("__term",
        when(col("__cp") > 0L && col("__cq") > 0L,
          (col("__cp").cast("double") / col("__np").cast("double") -
            col("__cq").cast("double") / col("__nq").cast("double")) *
            log((col("__cp").cast("double") / col("__np").cast("double")) /
              (col("__cq").cast("double") / col("__nq").cast("double"))))
          .otherwise(lit(0.0)))
      .withColumn("__psi", sum(col("__term")).over(
        ordW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__rn", row_number().over(ordW))
      .withColumn("__cnt", count(lit(1)).over(wType))
      .filter(col("__rn") === col("__cnt"))
      .select(col(typeCol), col("__np").as("n_base"),
        col("__nq").as("n_cur"), round(col("__psi"), 6).as("psi"))
      .orderBy(col(typeCol).asc)
  }

  val defs: Map[String, Q] = Map(
    "q_entropy_rate" -> ((s, dir) =>
      entropyRate(Tables.events(s, dir), "user_id", "ts", "event_id",
        "event_type")),
    "q_psi" -> ((s, dir) =>
      psi(Tables.events(s, dir), "event_type", "ts", "value", PsiSplit)))

  val oracle: Map[String, String] = Map(
    "q_entropy_rate" ->
      """WITH pairs AS (
        |  SELECT prev, event_type AS next, CAST(count(*) AS BIGINT) AS c
        |  FROM (
        |    SELECT event_type,
        |      lag(event_type) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS prev
        |    FROM events)
        |  WHERE prev IS NOT NULL GROUP BY 1, 2),
        |terms AS (
        |  SELECT prev, next, c,
        |    CAST(sum(c) OVER () AS BIGINT) AS n,
        |    (CAST(c AS DOUBLE) / CAST(sum(c) OVER () AS DOUBLE))
        |      * log2(CAST(c AS DOUBLE)
        |        / CAST(sum(c) OVER (PARTITION BY prev) AS DOUBLE)) AS term
        |  FROM pairs),
        |run AS (
        |  SELECT n,
        |    sum(term) OVER (ORDER BY prev, next
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h,
        |    row_number() OVER (ORDER BY prev, next) AS rn,
        |    count(*) OVER () AS cnt
        |  FROM terms),
        |dims AS (
        |  SELECT CAST(count(DISTINCT prev) AS BIGINT) AS states
        |  FROM pairs)
        |SELECT run.n AS n_transitions, dims.states AS n_states,
        |  round(-run.h, 6) AS entropy_rate_bits
        |FROM run, dims WHERE run.rn = run.cnt""".stripMargin,

    "q_psi" ->
      s"""WITH cells AS (
         |  SELECT event_type,
         |    least(CAST(floor(value / $PsiBinWidth) AS INTEGER),
         |      $PsiMaxBin) AS bin,
         |    CAST(sum(CASE WHEN ts < TIMESTAMP '$PsiSplit 00:00:00'
         |      THEN 1 ELSE 0 END) AS BIGINT) AS cp,
         |    CAST(sum(CASE WHEN ts < TIMESTAMP '$PsiSplit 00:00:00'
         |      THEN 0 ELSE 1 END) AS BIGINT) AS cq
         |  FROM events GROUP BY 1, 2),
         |terms AS (
         |  SELECT event_type, bin, cp, cq,
         |    CAST(sum(cp) OVER (PARTITION BY event_type) AS BIGINT) AS np,
         |    CAST(sum(cq) OVER (PARTITION BY event_type) AS BIGINT) AS nq,
         |    CASE WHEN cp > 0 AND cq > 0 THEN
         |      (CAST(cp AS DOUBLE)
         |          / CAST(sum(cp) OVER (PARTITION BY event_type) AS DOUBLE)
         |        - CAST(cq AS DOUBLE)
         |          / CAST(sum(cq) OVER (PARTITION BY event_type) AS DOUBLE))
         |      * ln((CAST(cp AS DOUBLE)
         |          / CAST(sum(cp) OVER (PARTITION BY event_type) AS DOUBLE))
         |        / (CAST(cq AS DOUBLE)
         |          / CAST(sum(cq) OVER (PARTITION BY event_type) AS DOUBLE)))
         |      ELSE 0.0 END AS term
         |  FROM cells),
         |run AS (
         |  SELECT event_type, np, nq,
         |    sum(term) OVER (PARTITION BY event_type ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS psi,
         |    row_number() OVER (PARTITION BY event_type ORDER BY bin) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS cnt
         |  FROM terms)
         |SELECT event_type, np AS n_base, nq AS n_cur,
         |  round(psi, 6) AS psi
         |FROM run WHERE rn = cnt ORDER BY event_type""".stripMargin)
}
