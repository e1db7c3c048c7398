package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hundred-sixty-eighth wave — RENDEZVOUS (highest-random-weight)
  * SHARDING: the assignment rule a 100 TB pipeline uses to route
  * documents to a FIXED pool of workers/shards so that RESIZING the
  * pool moves almost nothing. Each (doc, shard) pair gets an md5
  * weight; the doc lives on the argmax shard. Adding shard 9 steals
  * only the docs whose new weight wins — ~1/9 of the corpus — where
  * hash-mod-N reassigns ~8/9.
  *
  *  - **q_rendezvous**: the 8-shard assignment histogram (count +
  *    share per shard) — the balance audit.
  *  - **q_rendezvous_resize**: one row comparing the 8→9 resize
  *    movement under HRW vs under mod-N — the design justification,
  *    measured.
  *
  * Exact-parity discipline: weights are the house md5 split-hash
  * TRUNCATED to 14 hex chars (56 bits) so the argmax can be carried
  * as ONE packed BIGINT max — packed = w·16 + shard < 2⁶⁰ (no struct
  * argmax, no SortAggregate trap, ties impossible up to 56-bit md5
  * collisions and deterministic even then since the shard id is IN
  * the key); shares are count/count divisions.
  *
  * Scale shape: explode ×9 then ONE hash aggregate keyed on doc_id —
  * map-side combinable, no windows, no joins; the histogram is a
  * second 9-group aggregate. This is the shape that survives 100 TB:
  * assignment is embarrassingly parallel and the resize audit never
  * materializes both assignments separately.
  */
object Breadth167 {

  private[graft] val Shards = 8
  /** Packed HRW keys per doc (internal): max over s<8 and s<=8. */
  private[graft] def packed(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(Shards))).as("__s"))
      .withColumn("__w",
        conv(substring(md5(concat(lit("rdv#"),
          col("doc_id").cast("string"), lit("#"),
          col("__s").cast("string"))), 1, 14), 16, 10).cast("long"))
      .withColumn("__pk", col("__w") * 16 + col("__s"))
      .groupBy(col("doc_id"))
      .agg(max(when(col("__s") < Shards, col("__pk"))).as("__pk8"),
        max(col("__pk")).as("__pk9"))
      .select(col("doc_id"),
        pmod(col("__pk8"), lit(16L)).as("shard8"),
        pmod(col("__pk9"), lit(16L)).as("shard9"))

  /** 8-shard histogram + shares. */
  private[graft] def rendezvous(docs: DataFrame): DataFrame = {
    val p = packed(docs)
    val n = p.agg(count(lit(1)).as("__n"))
    p.groupBy(col("shard8").as("shard"))
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(n))
      .select(col("shard"), col("n_docs"),
        (col("n_docs").cast("double") / col("__n").cast("double"))
          .as("share"))
      .orderBy(col("shard").asc)
  }

  /** 8→9 resize movement, HRW vs mod-N. */
  private[graft] def rendezvousResize(docs: DataFrame): DataFrame =
    packed(docs)
      .withColumn("__h",
        conv(substring(md5(concat(lit("rdv#"),
          col("doc_id").cast("string"))), 1, 14), 16, 10).cast("long"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("shard8") =!= col("shard9"), 1L).otherwise(0L))
          .as("moved_hrw"),
        sum(when(pmod(col("__h"), lit(8L)) =!= pmod(col("__h"), lit(9L)),
          1L).otherwise(0L)).as("moved_mod"))
      .select(col("n"), col("moved_hrw"),
        (col("moved_hrw").cast("double") / col("n").cast("double"))
          .as("moved_share_hrw"),
        col("moved_mod"),
        (col("moved_mod").cast("double") / col("n").cast("double"))
          .as("moved_share_mod"))

  val defs: Map[String, Q] = Map(
    "q_rendezvous" -> ((s, dir) => rendezvous(Tables.documents(s, dir))),
    "q_rendezvous_resize" -> ((s, dir) =>
      rendezvousResize(Tables.documents(s, dir))))

  /** Packed-key CTE chain (no leading WITH), shared. */
  private val PkSql: String =
    s"""ex AS (
       |  SELECT doc_id, unnest(range(0, ${Shards + 1})) AS s
       |  FROM documents),
       |wk AS (
       |  SELECT doc_id, s,
       |    ('0x' || substr(md5('rdv#' || CAST(doc_id AS VARCHAR) || '#' ||
       |      CAST(s AS VARCHAR)), 1, 14))::BIGINT * 16 + s AS pk
       |  FROM ex),
       |asg AS (
       |  SELECT doc_id,
       |    max(CASE WHEN s < $Shards THEN pk END) % 16 AS shard8,
       |    max(pk) % 16 AS shard9
       |  FROM wk GROUP BY doc_id)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_rendezvous" ->
      s"""WITH $PkSql,
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM asg)
         |SELECT CAST(shard8 AS BIGINT) AS shard,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS DOUBLE) / CAST(nn.n AS DOUBLE) AS share
         |FROM asg CROSS JOIN nn
         |GROUP BY shard8, nn.n
         |ORDER BY shard""".stripMargin,

    "q_rendezvous_resize" ->
      s"""WITH $PkSql,
         |mv AS (
         |  SELECT doc_id, shard8, shard9,
         |    ('0x' || substr(md5('rdv#' || CAST(doc_id AS VARCHAR)),
         |      1, 14))::BIGINT AS h
         |  FROM asg)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS moved_hrw,
         |  CAST(sum(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END)
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS moved_share_hrw,
         |  CAST(sum(CASE WHEN h % 8 <> h % 9 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS moved_mod,
         |  CAST(sum(CASE WHEN h % 8 <> h % 9 THEN 1 ELSE 0 END)
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS moved_share_mod
         |FROM mv""".stripMargin)
}
