package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-twenty-eighth wave — **q_cdc_chunks**: content-defined
  * chunking of binary media payloads (the rolling-hash boundary rule
  * behind rsync/casync/restic-style dedup stores): a chunk boundary
  * opens wherever the Gear-like window hash
  * h_j = b_j + 31·b_{j−1} + 7·b_{j−2} + 3·b_{j−3} hits h ≡ 0 (mod 16),
  * so boundaries depend only on LOCAL content — shifted or repeated
  * payloads re-align on the same chunks, which fixed-size blocks
  * cannot do. Per media kind: blob/chunk counts, distinct-chunk
  * fingerprints, and the byte-level dedup ratio (the storage a
  * chunk-addressed store would actually keep).
  *
  * The Spark side reads the REAL payload bytes from the binary column
  * (1-byte substring → hex → int, per position); the oracle
  * reconstructs the same bytes arithmetically from the synthetic-media
  * contract (payload byte j = (seed·31 + (j−1)·7) mod 251 — the same
  * contract q_media_meta/q_media_dedup already pin).
  *
  * Scale shape: one posexplode over payload positions (bytes-bounded),
  * per-blob lag windows for the rolling hash, chunk fingerprints by
  * ordered aggregation — all blob-partitioned; the dedup rollup is
  * |distinct fingerprints|-bounded. */
object Breadth127 {

  private val MediaN = 300
  private val HeaderLen = 16
  private val BoundaryMod = 16

  /** Per-kind CDC chunk + dedup stats over the synthetic media set. */
  private[graft] def cdcChunks(media: DataFrame): DataFrame = {
    val d = (x: Column) => x.cast("double")
    val pos = media.select(col("media_id"), col("kind"),
        posexplode(sequence(lit(1),
          length(col("bytes")) - lit(HeaderLen))).as(Seq("__i", "j")))
      .select(col("media_id"), col("kind"), col("j"))
    val withB = pos.join(media.select(col("media_id"), col("bytes")),
        Seq("media_id"))
      .select(col("media_id"), col("kind"), col("j"),
        conv(hex(substring(col("bytes"), col("j") + lit(HeaderLen),
          lit(1))), 16, 10).cast("int").as("__b"))
    val w = Window.partitionBy(col("media_id")).orderBy(col("j").asc)
    val withH = withB
      .withColumn("__h", col("__b") + lit(31) * lag(col("__b"), 1).over(w)
        + lit(7) * lag(col("__b"), 2).over(w)
        + lit(3) * lag(col("__b"), 3).over(w))
      .withColumn("__bd",
        when(col("__h").isNotNull && col("__h") % BoundaryMod === 0, 1L)
          .otherwise(0L))
      .withColumn("__chunk", sum(col("__bd")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val chunks = withH.groupBy(col("media_id"), col("kind"), col("__chunk"))
      .agg(count(lit(1)).as("__len"),
        md5(array_join(transform(
          sort_array(collect_list(struct(col("j"), col("__b")))),
          _.getField("__b").cast("string")), ",")).as("__fp"))
    val perKind = chunks.groupBy(col("kind"))
      .agg(countDistinct(col("media_id")).as("n_blobs"),
        count(lit(1)).as("n_chunks"),
        sum(col("__len")).as("total_bytes"))
    val dedup = chunks.groupBy(col("kind"), col("__fp"))
      .agg(max(col("__len")).as("__l"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_distinct_chunks"),
        sum(col("__l")).as("stored_bytes"))
    perKind.join(dedup, Seq("kind"))
      .select(col("kind"), col("n_blobs"), col("n_chunks"),
        col("n_distinct_chunks"), col("total_bytes"), col("stored_bytes"),
        (d(col("stored_bytes")) / d(col("total_bytes"))).as("dedup_ratio"))
      .orderBy(col("kind").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_cdc_chunks" -> ((s, _) =>
      cdcChunks(graft.multimodal.Multimodal.syntheticMedia(s, MediaN)
        .toDF())))

  val oracle: Map[String, String] = Map(
    "q_cdc_chunks" ->
      s"""WITH m AS (
         |  SELECT id,
         |    CASE CAST(id % 3 AS INTEGER) WHEN 0 THEN 'image'
         |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |    id % 100 AS seed,
         |    128 + CAST(((id % 100) % 7) AS INTEGER) * 64 AS plen
         |  FROM range($MediaN) t(id)),
         |pos AS (
         |  SELECT id, kind, seed,
         |    unnest(generate_series(1, plen)) AS j
         |  FROM m),
         |b AS (
         |  SELECT id, kind, j,
         |    CAST(((seed * 31) + (j - 1) * 7) % 251 AS INTEGER) AS bv
         |  FROM pos),
         |h AS (
         |  SELECT id, kind, j, bv,
         |    bv + 31 * lag(bv, 1) OVER w + 7 * lag(bv, 2) OVER w
         |      + 3 * lag(bv, 3) OVER w AS hv
         |  FROM b
         |  WINDOW w AS (PARTITION BY id ORDER BY j)),
         |ck AS (
         |  SELECT id, kind, j, bv,
         |    CAST(sum(CASE WHEN hv IS NOT NULL
         |        AND hv % $BoundaryMod = 0 THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY id ORDER BY j
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS chunk
         |  FROM h),
         |chunks AS (
         |  SELECT id, kind, chunk,
         |    CAST(count(*) AS BIGINT) AS clen,
         |    md5(string_agg(CAST(bv AS VARCHAR), ',' ORDER BY j)) AS fp
         |  FROM ck GROUP BY 1, 2, 3),
         |pk AS (
         |  SELECT kind, CAST(count(DISTINCT id) AS BIGINT) AS n_blobs,
         |    CAST(count(*) AS BIGINT) AS n_chunks,
         |    CAST(sum(clen) AS BIGINT) AS total_bytes
         |  FROM chunks GROUP BY 1),
         |dd AS (
         |  SELECT kind, CAST(count(*) AS BIGINT) AS n_distinct_chunks,
         |    CAST(sum(l) AS BIGINT) AS stored_bytes
         |  FROM (SELECT kind, fp, CAST(max(clen) AS BIGINT) AS l
         |        FROM chunks GROUP BY 1, 2)
         |  GROUP BY 1)
         |SELECT pk.kind, n_blobs, n_chunks, n_distinct_chunks,
         |  total_bytes, stored_bytes,
         |  CAST(stored_bytes AS DOUBLE) / CAST(total_bytes AS DOUBLE)
         |    AS dedup_ratio
         |FROM pk JOIN dd ON dd.kind = pk.kind
         |ORDER BY pk.kind""".stripMargin)
}
