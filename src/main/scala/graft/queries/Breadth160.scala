package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hundred-sixty-first wave — PAIRED tests over the quality gates:
  * when two (or three) filters judge the SAME documents, comparing
  * their pass rates with an unpaired test throws away the pairing and
  * understates significance. The classic pair:
  *
  *  - **q_mcnemar**: McNemar's test on the discordant cells of
  *    (length gate) vs (KN perplexity gate) — b = passes length only,
  *    c = passes perplexity only; χ² = (b−c)²/(b+c), plus the
  *    Edwards continuity-corrected (|b−c|−1)²/(b+c). The question it
  *    answers: do the two gates reject the SAME share of the corpus,
  *    or is one systematically stricter?
  *  - **q_cochran_q**: Cochran's Q over the THREE independent gates
  *    (length, exact-dedup survivor, perplexity keep) — the k-sample
  *    generalization, Q = (k−1)(k·ΣT_j² − S²)/(k·S − ΣR_i²) with
  *    column totals T_j and per-doc row sums R_i. Q ~ χ²(k−1) under
  *    "all gates equally strict".
  *
  * Exact-parity discipline: all cells/totals are integer counts from
  * wave 149's gate flags; both statistics are ONE double division of
  * exact integer products ((b−c)² ≤ n² ≈ 2.5e9 at sf0.1; k·ΣT² ≤ 3n²
  * — int64 headroom to n ≈ 10⁹ docs). Degenerate denominators (no
  * discordant pairs; every doc all-pass/all-fail) emit NULL under the
  * ANSI guard, mirrored in the oracle.
  *
  * Scale shape: reuses the gate-flag table (one map pass + bounded
  * hash windows + the KN chain); each statistic is then ONE global
  * aggregate — no new corpus-scale shuffle.
  */
object Breadth160 {

  /** McNemar over (len_ok, keep). */
  private[graft] def mcnemar(docs: DataFrame): DataFrame =
    Breadth148.gateFlags(docs).agg(
        count(lit(1)).as("n"),
        sum(when(col("len_ok") && col("keep"), 1L).otherwise(0L))
          .as("n_both"),
        sum(when(col("len_ok") && !col("keep"), 1L).otherwise(0L))
          .as("b"),
        sum(when(!col("len_ok") && col("keep"), 1L).otherwise(0L))
          .as("c"))
      .select(col("n"), col("n_both"), col("b"), col("c"),
        when(col("b") + col("c") === 0, lit(null)).otherwise(
          ((col("b") - col("c")) * (col("b") - col("c"))).cast("double") /
            (col("b") + col("c")).cast("double")).as("mcnemar"),
        when(col("b") + col("c") === 0, lit(null)).otherwise(
          ((abs(col("b") - col("c")) - 1) * (abs(col("b") - col("c")) - 1))
            .cast("double") /
            (col("b") + col("c")).cast("double")).as("mcnemar_cc"),
        ((col("n") - col("b") - col("c")).cast("double") /
          col("n").cast("double")).as("agree_share"))

  /** Cochran's Q over (len_ok, surv_full, keep), k = 3. */
  private[graft] def cochranQ(docs: DataFrame): DataFrame =
    Breadth148.gateFlags(docs)
      .select(
        when(col("len_ok"), 1L).otherwise(0L).as("__g1"),
        when(col("surv_full"), 1L).otherwise(0L).as("__g2"),
        when(col("keep"), 1L).otherwise(0L).as("__g3"))
      .withColumn("__r", col("__g1") + col("__g2") + col("__g3"))
      .agg(count(lit(1)).as("n"),
        sum(col("__g1")).as("t1"), sum(col("__g2")).as("t2"),
        sum(col("__g3")).as("t3"),
        sum(col("__r") * col("__r")).as("__sr2"))
      .select(col("n"), col("t1"), col("t2"), col("t3"),
        when(lit(3L) * (col("t1") + col("t2") + col("t3")) - col("__sr2")
            === 0, lit(null))
          .otherwise(
            (lit(2L) * (lit(3L) * (col("t1") * col("t1")
              + col("t2") * col("t2") + col("t3") * col("t3"))
              - (col("t1") + col("t2") + col("t3"))
                * (col("t1") + col("t2") + col("t3")))).cast("double") /
              (lit(3L) * (col("t1") + col("t2") + col("t3"))
                - col("__sr2")).cast("double"))
          .as("q_stat"))

  val defs: Map[String, Q] = Map(
    "q_mcnemar" -> ((s, dir) => mcnemar(Tables.documents(s, dir))),
    "q_cochran_q" -> ((s, dir) => cochranQ(Tables.documents(s, dir))))

  val oracle: Map[String, String] = Map(
    "q_mcnemar" ->
      s"""WITH ${Breadth148.FlagSql},
         |ag AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN len_ok AND keep THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_both,
         |    CAST(sum(CASE WHEN len_ok AND NOT keep THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN NOT len_ok AND keep THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c
         |  FROM gf)
         |SELECT n, n_both, b, c,
         |  CASE WHEN b + c = 0 THEN NULL
         |    ELSE CAST((b - c) * (b - c) AS DOUBLE)
         |      / CAST(b + c AS DOUBLE) END AS mcnemar,
         |  CASE WHEN b + c = 0 THEN NULL
         |    ELSE CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
         |      / CAST(b + c AS DOUBLE) END AS mcnemar_cc,
         |  CAST(n - b - c AS DOUBLE) / CAST(n AS DOUBLE) AS agree_share
         |FROM ag""".stripMargin,

    "q_cochran_q" ->
      s"""WITH ${Breadth148.FlagSql},
         |g AS (
         |  SELECT CASE WHEN len_ok THEN CAST(1 AS BIGINT)
         |      ELSE CAST(0 AS BIGINT) END AS g1,
         |    CASE WHEN surv_full THEN CAST(1 AS BIGINT)
         |      ELSE CAST(0 AS BIGINT) END AS g2,
         |    CASE WHEN keep THEN CAST(1 AS BIGINT)
         |      ELSE CAST(0 AS BIGINT) END AS g3
         |  FROM gf),
         |ag AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(g1) AS BIGINT) AS t1,
         |    CAST(sum(g2) AS BIGINT) AS t2,
         |    CAST(sum(g3) AS BIGINT) AS t3,
         |    CAST(sum((g1 + g2 + g3) * (g1 + g2 + g3)) AS BIGINT) AS sr2
         |  FROM g)
         |SELECT n, t1, t2, t3,
         |  CASE WHEN 3 * (t1 + t2 + t3) - sr2 = 0 THEN NULL
         |    ELSE CAST(2 * (3 * (t1 * t1 + t2 * t2 + t3 * t3)
         |        - (t1 + t2 + t3) * (t1 + t2 + t3)) AS DOUBLE)
         |      / CAST(3 * (t1 + t2 + t3) - sr2 AS DOUBLE) END AS q_stat
         |FROM ag""".stripMargin)
}
