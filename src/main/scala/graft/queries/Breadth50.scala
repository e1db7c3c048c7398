package graft.queries

import graft.multimodal.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fifty-first wave — perceptual fingerprints for binary media.
  *
  * payloadDedup (q_media_dedup) catches byte-IDENTICAL blobs; a
  * re-encoded or lightly-edited image needs a fingerprint that DEGRADES
  * with the edit instead of breaking. Block-mean hashing (the aHash
  * family) is that fingerprint, expressed engine-side over the opaque
  * binary column:
  *
  *  - **q_media_phash**: the 16-bit block-mean hash per blob (bit k =
  *    block k's byte mean above the payload mean — an integer
  *    comparison, no floats) plus its popcount. Partition-batched
  *    byte work (the decodeMeta shape); the oracle restates the hash
  *    closed-form over the synthetic corpus's byte generator.
  *  - **q_phash_neardup**: within-kind near-dup pairs at hamming ≤ 2,
  *    found by PIGEONHOLE BANDING — the 16 bits split 6/5/5, ≤2 flips
  *    leave ≥1 band intact, so band-equality candidate generation is
  *    COMPLETE (the q_simhash design, re-applied to media); candidates
  *    verify with one XOR+popcount. Never all-pairs: Σ per-band² of
  *    bucket sizes, the same cost shape that scales SimHash.
  *
  * Determinism: everything is integer arithmetic on deterministic
  * bytes; both engines state the same generator. */
object Breadth50 {

  private[graft] val PhashBlocks = 16
  private[graft] val MaxHamming = 2
  private[graft] val MediaN = 300
  /** (offset, width-mask) of the 3 pigeonhole bands: 6 + 5 + 5 bits. */
  private[graft] val PhashBands = Seq((0, 0x3FL), (6, 0x1FL), (11, 0x1FL))

  private[graft] def phashes(s: org.apache.spark.sql.SparkSession): DataFrame =
    Multimodal.blockHash(Multimodal.syntheticMedia(s, MediaN), PhashBlocks)

  private[graft] def phashNearDups(h: DataFrame): DataFrame = {
    val bands = PhashBands.zipWithIndex.map { case ((off, mask), i) =>
      struct(lit(i).as("band_idx"),
        shiftright(col("phash"), off).bitwiseAND(lit(mask)).as("band_val"))
    }
    val banded = h.select(col("media_id"), col("kind"), col("phash"),
      explode(array(bands: _*)).as("__b"))
      .select(col("media_id"), col("kind"), col("phash"),
        col("__b.band_idx").as("band_idx"), col("__b.band_val").as("band_val"))
    val a = banded.select(col("kind"), col("band_idx"), col("band_val"),
      col("media_id").as("id_a"), col("phash").as("__ha"))
    val b = banded.select(col("kind"), col("band_idx"), col("band_val"),
      col("media_id").as("id_b"), col("phash").as("__hb"))
    a.join(b, Seq("kind", "band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("kind"), col("id_a"), col("id_b"),
        expr("bit_count(__ha ^ __hb)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= MaxHamming)
      .orderBy(col("kind").asc, col("id_a").asc, col("id_b").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_media_phash" -> ((s, _) =>
      phashes(s)
        .select(col("media_id"), col("kind"), col("phash"),
          expr("bit_count(phash)").as("n_bits"))
        .orderBy(col("media_id").asc)),
    "q_phash_neardup" -> ((s, _) => phashNearDups(phashes(s))))

  /** The synthetic corpus's block-mean hash, closed form: payload byte
    * j is (seed·31 + j·7) mod 251 with seed = id mod 100 and length
    * 128 + (seed mod 7)·64 (graft.multimodal.Multimodal.syntheticMedia),
    * so the hash is restatable from a generated id range. */
  private val phashSql: String =
    s"""m AS (
       |  SELECT id, id % 100 AS seed,
       |    CASE CAST(id % 3 AS INTEGER) WHEN 0 THEN 'image'
       |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |    128 + ((id % 100) % 7) * 64 AS len
       |  FROM range($MediaN) t(id)),
       |byt AS (
       |  SELECT id, kind, len, seed, unnest(range(len)) AS j FROM m),
       |v AS (
       |  SELECT id, kind, (seed * 31 + j * 7) % 251 AS byte,
       |    j // (len // $PhashBlocks) AS blk
       |  FROM byt),
       |bsum AS (
       |  SELECT id, kind, blk, sum(byte) AS bs FROM v GROUP BY 1, 2, 3),
       |btot AS (
       |  SELECT id, kind, blk, bs, sum(bs) OVER (PARTITION BY id) AS tot
       |  FROM bsum),
       |h AS (
       |  SELECT id AS media_id, kind,
       |    CAST(sum(CASE WHEN bs * $PhashBlocks > tot
       |      THEN (CAST(1 AS BIGINT) << blk) ELSE 0 END) AS BIGINT) AS phash
       |  FROM btot GROUP BY 1, 2)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_media_phash" ->
      s"""WITH $phashSql
         |SELECT media_id, kind, phash,
         |  CAST(bit_count(phash) AS INTEGER) AS n_bits
         |FROM h ORDER BY media_id""".stripMargin,

    "q_phash_neardup" ->
      s"""WITH $phashSql
         |SELECT a.kind, a.media_id AS id_a, b.media_id AS id_b,
         |  CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
         |FROM h a JOIN h b
         |  ON a.kind = b.kind AND a.media_id < b.media_id
         |WHERE bit_count(xor(a.phash, b.phash)) <= $MaxHamming
         |ORDER BY a.kind, id_a, id_b""".stripMargin)
}
