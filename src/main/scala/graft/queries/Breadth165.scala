package graft.queries

import graft.Tables
import graft.sim.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-sixty-sixth wave — RETRIEVAL evaluation by first relevant
  * hit, the two numbers a retrieval stack is actually tuned on and the
  * last gap in the eval tier (recall curve, NDCG, AP already exist):
  *
  *  - **q_first_hit**: per probe (the house vec_id < 20 set), the rank
  *    of the FIRST same-label neighbor in the exact cosine ranking,
  *    with its reciprocal rank — the per-query evidence table.
  *  - **q_mrr**: the corpus roll-up — mean reciprocal rank plus
  *    hit@1/5/10 shares. MRR is the metric for "the user takes the
  *    first relevant result"; hit@k for "anything relevant on page 1".
  *
  * Exact-parity discipline: ranking is the shared 6-dp-rounded cosine
  * with train-id tiebreak (deterministic total order); the reciprocal
  * rank is the INTEGER 1000000000 div rank (exact, order-free to sum);
  * MRR is one terminal division by |probes|·1e9; hit@k are count/count
  * divisions. A probe with no same-label neighbor contributes rr = 0
  * and misses every k (coalesce, mirrored in the oracle).
  *
  * Scale shape: fixed probe set → the pair table is 20·N rows, one
  * window min per probe partition; at 100 TB the ranking swaps to the
  * ANN shortlist (PQ/IVF) with first-hit rank measured within the
  * shortlist — the exact form stays as the gate-SF oracle twin.
  */
object Breadth165 {

  private[graft] val ProbeMax = 20L
  private[graft] val RrScale = 1000000000L

  /** Rank of the first same-label neighbor per probe (internal). */
  private[graft] def firstHit(emb: DataFrame): DataFrame = {
    val probes = emb.filter(col("vec_id") < ProbeMax)
      .select(col("vec_id").as("probe_id"), col("embedding").as("__pv"),
        col("label").as("__plabel"))
    val corpus = emb.select(col("vec_id").as("__cid"),
      col("embedding").as("__cv"), col("label").as("__clabel"))
    val byDist = Window.partitionBy(col("probe_id"))
      .orderBy(col("__cos").desc, col("__cid").asc)
    broadcast(probes).crossJoin(corpus)
      .filter(col("__cid") =!= col("probe_id"))
      .select(col("probe_id"), col("__cid"),
        (col("__clabel") === col("__plabel")).as("__match"),
        round(Similarity.cosine(col("__pv"), col("__cv")), 6).as("__cos"))
      .withColumn("__rnk", row_number().over(byDist).cast("long"))
      .groupBy(col("probe_id"))
      .agg(min(when(col("__match"), col("__rnk"))).as("first_hit_rank"))
      .select(col("probe_id"), col("first_hit_rank"),
        coalesce(expr(s"$RrScale div first_hit_rank"), lit(0L))
          .as("rr_1e9"))
  }

  private[graft] def firstHitTable(emb: DataFrame): DataFrame =
    firstHit(emb).orderBy(col("probe_id").asc)

  /** One-row MRR + hit@k roll-up. */
  private[graft] def mrr(emb: DataFrame): DataFrame =
    firstHit(emb).agg(
        count(lit(1)).as("n_probes"),
        sum(col("rr_1e9")).as("__srr"),
        sum(when(col("first_hit_rank") <= 1, 1L).otherwise(0L)).as("__h1"),
        sum(when(col("first_hit_rank") <= 5, 1L).otherwise(0L)).as("__h5"),
        sum(when(col("first_hit_rank") <= 10, 1L).otherwise(0L))
          .as("__h10"))
      .select(col("n_probes"),
        (col("__srr").cast("double") /
          (col("n_probes") * lit(RrScale)).cast("double")).as("mrr"),
        (col("__h1").cast("double") / col("n_probes").cast("double"))
          .as("hit1"),
        (col("__h5").cast("double") / col("n_probes").cast("double"))
          .as("hit5"),
        (col("__h10").cast("double") / col("n_probes").cast("double"))
          .as("hit10"))

  val defs: Map[String, Q] = Map(
    "q_first_hit" -> ((s, dir) => firstHitTable(Tables.embeddings(s, dir))),
    "q_mrr" -> ((s, dir) => mrr(Tables.embeddings(s, dir))))

  /** First-hit CTE chain (no leading WITH), shared. */
  private val HitSql: String =
    s"""pv AS (
       |  SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS v,
       |    label AS plabel
       |  FROM embeddings WHERE vec_id < $ProbeMax),
       |cv AS (
       |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS v,
       |    label AS clabel
       |  FROM embeddings),
       |ranked AS (
       |  SELECT p.probe_id, c.clabel = p.plabel AS m,
       |    CAST(row_number() OVER (PARTITION BY p.probe_id
       |      ORDER BY round(list_dot_product(p.v, c.v)
       |        / (sqrt(list_dot_product(p.v, p.v))
       |          * sqrt(list_dot_product(c.v, c.v))), 6) DESC, c.cid)
       |      AS BIGINT) AS rnk
       |  FROM pv p JOIN cv c ON c.cid <> p.probe_id),
       |fh AS (
       |  SELECT probe_id,
       |    min(CASE WHEN m THEN rnk END) AS first_hit_rank,
       |    coalesce($RrScale // min(CASE WHEN m THEN rnk END),
       |      CAST(0 AS BIGINT)) AS rr_1e9
       |  FROM ranked GROUP BY probe_id)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_first_hit" ->
      s"""WITH $HitSql
         |SELECT probe_id, first_hit_rank, CAST(rr_1e9 AS BIGINT) AS rr_1e9
         |FROM fh
         |ORDER BY probe_id""".stripMargin,

    "q_mrr" ->
      s"""WITH $HitSql
         |SELECT CAST(count(*) AS BIGINT) AS n_probes,
         |  CAST(sum(rr_1e9) AS DOUBLE)
         |    / CAST(count(*) * $RrScale AS DOUBLE) AS mrr,
         |  CAST(sum(CASE WHEN first_hit_rank <= 1 THEN 1 ELSE 0 END)
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS hit1,
         |  CAST(sum(CASE WHEN first_hit_rank <= 5 THEN 1 ELSE 0 END)
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS hit5,
         |  CAST(sum(CASE WHEN first_hit_rank <= 10 THEN 1 ELSE 0 END)
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS hit10
         |FROM fh""".stripMargin)
}
