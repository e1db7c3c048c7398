package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-forty-ninth wave — the PIPELINE YIELD audit: the engine's
  * quality gates composed into the sequential funnel a pretraining
  * data pipeline actually runs, with per-stage survival accounting —
  * the ledger a data lead reads before ordering a 100 TB crawl
  * reprocess. Three representative gates, in pipeline order:
  *
  *  1. **length** — ≥ 20 whitespace tokens (the Gopher-style floor);
  *  2. **exact_dedup** — md5(normalized text) survivor among stage-1
  *     survivors (min doc_id wins — the q_dedup_exact convention,
  *     applied SEQUENTIALLY: dedup never sees length-rejected docs);
  *  3. **ppl_gate** — the Kneser–Ney corpus-mean keep flag
  *     (Breadth139, trained on the FULL corpus — the model is fit
  *     once upstream; the gate applies downstream).
  *
  * q_pipeline_yield emits one row per stage (n_in, n_out, yield);
  * q_gate_overlap applies the three gates INDEPENDENTLY to the full
  * corpus and emits the 2³ combination counts — the correlation
  * matrix that tells you which gates are redundant.
  *
  * Exact-parity discipline: every gate is integer/boolean (token
  * counts, md5 min-id, the KN integer cross-multiplied gate); yields
  * are one count/count division. Docs with < 2 tokens have no KN
  * score — their keep is FALSE by coalesce in both engines.
  *
  * Scale shape: gates 1–2 are one map pass + one hash-partitioned
  * min-per-hash window (bounded groups); gate 3 reuses the KN chain
  * (Breadth139's shapes); the funnel itself is ONE conditional
  * aggregate over the flag table, the overlap one 8-group aggregate.
  */
object Breadth148 {

  private[graft] val MinTokens = 20

  /** Per-doc gate flags: len_ok; surv_seq (dedup among len_ok);
    * surv_full (dedup on the full corpus); keep (KN gate, false when
    * unscored). */
  private[graft] def gateFlags(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"),
      (size(graft.text.Text.tokens(col("text"))) >= MinTokens)
        .as("len_ok"),
      md5(graft.text.Text.norm(col("text"))).as("__h"))
    val wH = Window.partitionBy(col("__h"))
    val flagged = base
      .withColumn("surv_seq",
        col("len_ok") &&
          min(when(col("len_ok"), col("doc_id"))).over(wH)
            === col("doc_id"))
      .withColumn("surv_full",
        min(col("doc_id")).over(wH) === col("doc_id"))
    val keep = Breadth139.knScores(docs)
      .select(col("doc_id"), col("keep"))
    flagged.join(keep, Seq("doc_id"), "left")
      .select(col("doc_id"), col("len_ok"), col("surv_seq"),
        col("surv_full"), coalesce(col("keep"), lit(false)).as("keep"))
  }

  /** The sequential funnel: stage_id, stage, n_in, n_out, yield. */
  private[graft] def pipelineYield(docs: DataFrame): DataFrame = {
    val f = gateFlags(docs)
    val agg = f.agg(
      count(lit(1)).as("__n0"),
      sum(when(col("len_ok"), 1L).otherwise(0L)).as("__n1"),
      sum(when(col("surv_seq"), 1L).otherwise(0L)).as("__n2"),
      sum(when(col("surv_seq") && col("keep"), 1L).otherwise(0L))
        .as("__n3"))
    def stage(id: Int, name: String, nIn: String, nOut: String) =
      struct(lit(id.toLong).as("stage_id"), lit(name).as("stage"),
        col(nIn).as("n_in"), col(nOut).as("n_out"),
        (col(nOut).cast("double") / col(nIn).cast("double"))
          .as("yield_frac"))
    agg.select(explode(array(
        stage(1, "length", "__n0", "__n1"),
        stage(2, "exact_dedup", "__n1", "__n2"),
        stage(3, "ppl_gate", "__n2", "__n3"))).as("__s"))
      .select(col("__s.stage_id"), col("__s.stage"), col("__s.n_in"),
        col("__s.n_out"), col("__s.yield_frac"))
      .orderBy(col("stage_id").asc)
  }

  /** Independent-gate overlap: the 2³ combination counts. */
  private[graft] def gateOverlap(docs: DataFrame): DataFrame =
    gateFlags(docs)
      .groupBy(col("len_ok"), col("surv_full"), col("keep"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("len_ok").asc, col("surv_full").asc, col("keep").asc)

  val defs: Map[String, Q] = Map(
    "q_pipeline_yield" -> ((s, dir) =>
      pipelineYield(Tables.documents(s, dir))),
    "q_gate_overlap" -> ((s, dir) =>
      gateOverlap(Tables.documents(s, dir))))

  /** Gate-flag CTE chain (no leading WITH) — reuses Breadth139's KN
    * chain for the keep flag. Shared with wave 161's paired tests. */
  private[graft] val FlagSql: String =
    s"""${Breadth139.KnChainSql},
       |kp AS (
       |  SELECT doc_id, sum_lp_q * tn >= n_bigrams * ts AS keep
       |  FROM pd CROSS JOIN tot),
       |gb AS (
       |  SELECT doc_id,
       |    len(${Extensions.sqlTokens("text")}) >= $MinTokens AS len_ok,
       |    md5(${Extensions.sqlNorm("text")}) AS h
       |  FROM documents),
       |gf AS (
       |  SELECT g.doc_id, g.len_ok,
       |    g.len_ok AND
       |      min(CASE WHEN g.len_ok THEN g.doc_id END)
       |        OVER (PARTITION BY g.h) = g.doc_id AS surv_seq,
       |    min(g.doc_id) OVER (PARTITION BY g.h) = g.doc_id AS surv_full,
       |    coalesce(k.keep, false) AS keep
       |  FROM gb g LEFT JOIN kp k ON g.doc_id = k.doc_id)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_pipeline_yield" ->
      s"""WITH $FlagSql,
         |ag AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n0,
         |    CAST(sum(CASE WHEN len_ok THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n1,
         |    CAST(sum(CASE WHEN surv_seq THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n2,
         |    CAST(sum(CASE WHEN surv_seq AND keep THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n3
         |  FROM gf)
         |SELECT CAST(1 AS BIGINT) AS stage_id, 'length' AS stage,
         |  n0 AS n_in, n1 AS n_out,
         |  CAST(n1 AS DOUBLE) / CAST(n0 AS DOUBLE) AS yield_frac
         |FROM ag
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), 'exact_dedup', n1, n2,
         |  CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) FROM ag
         |UNION ALL
         |SELECT CAST(3 AS BIGINT), 'ppl_gate', n2, n3,
         |  CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE) FROM ag
         |ORDER BY stage_id""".stripMargin,

    "q_gate_overlap" ->
      s"""WITH $FlagSql
         |SELECT len_ok, surv_full, keep, CAST(count(*) AS BIGINT) AS n
         |FROM gf
         |GROUP BY len_ok, surv_full, keep
         |ORDER BY len_ok, surv_full, keep""".stripMargin)
}
