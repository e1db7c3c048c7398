package graft

import graft.queries.Breadth127
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-twenty-eighth wave (Breadth127 CDC
  * chunking). */
class Wave134Spec extends SparkSpec {
  import spark.implicits._

  private def blob(id: Long, payload: Array[Byte]): (Long, String,
      Array[Byte]) =
    (id, "image", Array.fill[Byte](16)(0) ++ payload)

  test("cdcChunks re-aligns after an insertion — the property fixed-" +
    "size blocks lack") {
    // payload A: a noisy-ish deterministic pattern long enough for
    // several boundaries; payload B: ONE byte prepended, then A
    val a = Array.tabulate[Byte](400)(j => ((j * 37 + 11) % 251).toByte)
    val b = (113.toByte +: a.toSeq).toArray
    val media = Seq(blob(0L, a), blob(1L, b))
      .toDF("media_id", "kind", "bytes")
    val got = Breadth127.cdcChunks(media).collect()(0)
    val (nChunks, nDistinct, total, stored) =
      (got.getLong(2), got.getLong(3), got.getLong(4), got.getLong(5))
    assert(total === 801L)
    // the shifted copy shares the tail chunks: the distinct set is
    // well under the chunk count, and stored bytes well under total
    assert(nDistinct < nChunks)
    assert(stored < total)
    // a fixed-size blocking of the same pair shares NOTHING: every
    // 16-byte block of B is off by one — pin that CDC beats it by
    // requiring at least a third of the bytes deduped
    assert(stored.toDouble / total < 0.67)
  }

  test("cdcChunks: identical payloads dedup to one copy per chunk set") {
    val a = Array.tabulate[Byte](300)(j => ((j * 53 + 7) % 251).toByte)
    val media = Seq(blob(0L, a), blob(1L, a), blob(2L, a))
      .toDF("media_id", "kind", "bytes")
    val got = Breadth127.cdcChunks(media).collect()(0)
    assert(got.getLong(1) === 3L)           // blobs
    assert(got.getLong(4) === 900L)         // total payload bytes
    // at most one copy survives; intra-blob chunk repeats dedup
    // further (260 measured on this pattern — deterministic)
    assert(got.getLong(5) === 260L)
    assert(got.getLong(5) <= 300L)
    assert(got.getDouble(6) === got.getLong(5).toDouble / 900.0)
  }
}
