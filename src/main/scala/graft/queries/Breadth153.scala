package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-fifty-fourth wave — the TRAINING SCHEDULE pair: how much
  * of each source to sample (temperature-scaled mixing — the
  * mT5/Pile-style α-weighting that up-samples small sources without
  * letting any source dominate) and in what order to visit documents
  * each epoch (deterministic keyed shuffling — reproducible data
  * order is a training-run requirement, not a nicety).
  *
  *  - **q_temperature_mix** (α = 0.5): per source, w_s = √n_s — one
  *    IEEE-correctly-rounded sqrt of an exact integer, quantized to
  *    1e-6 units so the share denominator is an order-free integer
  *    sum; emits raw share, temperature share, and the oversample
  *    factor share_t·N/n_s (> 1 ⇔ the source is up-sampled).
  *  - **q_epoch_order** (epochs 1–3): the visit order is the rank of
  *    md5(epoch ‖ ':' ‖ doc_id) — a keyed permutation both engines
  *    replay bit-equally; emits the first 5 visits per epoch. The
  *    permutation property (every epoch visits every doc exactly
  *    once, orders differ across epochs) is spec-pinned.
  *
  * Scale shape: mixing is one |sources|-row aggregate; the epoch
  * order is a per-row md5 + a rank window per epoch — at 100 TB the
  * full materialized order IS the training manifest (written
  * partitioned by rank range); the top-5 head here is the gate-SF
  * witness. No joins, no row-level shuffle beyond the rank.
  */
object Breadth153 {

  private[graft] val Epochs = 3
  private[graft] val HeadN = 5

  /** Temperature-α=0.5 source mixing table. */
  private[graft] def temperatureMix(docs: DataFrame): DataFrame = {
    val w = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("__wq",
        floor(sqrt(col("n_docs").cast("double")) * lit(1.0e6) + lit(0.5))
          .cast("long"))
    val tot = w.agg(sum(col("n_docs")).as("__n"),
      sum(col("__wq")).as("__ws"))
    w.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        (col("n_docs").cast("double") / col("__n").cast("double"))
          .as("share_raw"),
        (col("__wq").cast("double") / col("__ws").cast("double"))
          .as("share_temp"),
        ((col("__wq").cast("double") * col("__n").cast("double"))
          / (col("__ws").cast("double") * col("n_docs").cast("double")))
          .as("oversample"))
      .orderBy(col("source").asc)
  }

  /** The keyed per-epoch visit rank for every doc. */
  private[graft] def epochRanks(docs: DataFrame,
                                epochs: Int = Epochs): DataFrame = {
    val byEpoch = (1 to epochs).map { e =>
      docs.select(lit(e.toLong).as("epoch"), col("doc_id"),
        md5(concat(lit(e.toString), lit(":"),
          col("doc_id").cast("string"))).as("__k"))
    }.reduce(_ unionAll _)
    byEpoch.withColumn("pos", row_number().over(
        Window.partitionBy(col("epoch"))
          .orderBy(col("__k").asc, col("doc_id").asc)).cast("long"))
      .select(col("epoch"), col("pos"), col("doc_id"))
  }

  /** The first HeadN visits of each epoch. */
  private[graft] def epochOrderHead(docs: DataFrame): DataFrame =
    epochRanks(docs).filter(col("pos") <= HeadN)
      .orderBy(col("epoch").asc, col("pos").asc)

  val defs: Map[String, Q] = Map(
    "q_temperature_mix" -> ((s, dir) =>
      temperatureMix(Tables.documents(s, dir))),
    "q_epoch_order" -> ((s, dir) =>
      epochOrderHead(Tables.documents(s, dir))))

  val oracle: Map[String, String] = Map(
    "q_temperature_mix" ->
      """WITH w AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1.0e6 + 0.5)
        |      AS BIGINT) AS wq
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n,
        |  CAST(sum(wq) AS BIGINT) AS ws FROM w)
        |SELECT source, n_docs,
        |  CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE) AS share_raw,
        |  CAST(wq AS DOUBLE) / CAST(ws AS DOUBLE) AS share_temp,
        |  (CAST(wq AS DOUBLE) * CAST(n AS DOUBLE))
        |    / (CAST(ws AS DOUBLE) * CAST(n_docs AS DOUBLE)) AS oversample
        |FROM w CROSS JOIN t
        |ORDER BY source""".stripMargin,

    "q_epoch_order" ->
      s"""WITH e AS (
         |  SELECT CAST(ep AS BIGINT) AS epoch, doc_id,
         |    md5(CAST(ep AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))
         |      AS k
         |  FROM documents
         |  CROSS JOIN (SELECT unnest(range(1, ${Epochs + 1})) AS ep) eps),
         |r AS (
         |  SELECT epoch, doc_id,
         |    CAST(row_number() OVER (PARTITION BY epoch
         |      ORDER BY k, doc_id) AS BIGINT) AS pos
         |  FROM e)
         |SELECT epoch, pos, doc_id
         |FROM r WHERE pos <= $HeadN
         |ORDER BY epoch, pos""".stripMargin)
}
