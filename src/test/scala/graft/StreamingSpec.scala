package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

/** Streaming semantics (SURVEY.md §2.9): batch/stream parity of the
  * shared transforms, watermark-bounded windowed aggs, snapshot
  * maintenance via foreachBatch — the reference's tick formalized. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, minute: Int, user: Long, typ: String, v: Double) =
    Ev(id, Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), user, typ, v, "{}")

  test("windowedStats: stream (append mode after watermark) == batch on same data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val batch1 = Seq(ev(1, 0, 1, "click", 1.0), ev(2, 3, 1, "click", 2.0),
      ev(3, 7, 2, "view", 5.0))
    // batch2's late max ts pushes the watermark past batch1's windows
    val batch2 = Seq(ev(4, 40, 1, "click", 9.0))
    val q = Streams.windowedStats(mem.toDF(), "5 minutes", "1 minute")
      .writeStream.format("memory").queryName("ws_out")
      .outputMode("append").start()
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ws_out")
      .select("window_start", "event_type", "n", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val batchTwin = Streams.windowedStats(
        (batch1 ++ batch2).toDF()
          .withColumn("ts", col("ts").cast("timestamp_ntz")), "5 minutes", "1 minute")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    // every closed (emitted) stream window must match the batch result
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batchTwin), s"stream=$streamed batch=$batchTwin")
  }

  test("dedupWithinWatermark drops re-deliveries of the same (user,event)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streams.dedupWithinWatermark(mem.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dd_out")
      .outputMode("append").start()
    mem.addData(ev(1, 0, 1, "click", 1.0), ev(1, 0, 1, "click", 1.0),
      ev(2, 1, 1, "view", 2.0))
    q.processAllAvailable()
    mem.addData(ev(1, 0, 1, "click", 1.0)) // replay within watermark
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dd_out").count() == 2)
  }

  test("snapshot stream: foreachBatch appends + recomputes latest-per-key " +
    "and invokes the broadcast seam per tick") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val store = Files.createTempDirectory("graft_store").toString + "/prices"
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val snaps = scala.collection.mutable.ArrayBuffer.empty[Map[Long, Double]]
    val q = Streams.startSnapshotStream(spark, mem.toDF(), store, ckpt,
        Trigger.ProcessingTime(0)) { (snap, _) =>
      snaps += snap.select("user_id", "value").as[(Long, Double)].collect().toMap
    }
    mem.addData(ev(1, 0, 1, "click", 1.0), ev(2, 1, 2, "view", 5.0))
    q.processAllAvailable()
    mem.addData(ev(3, 2, 1, "click", 7.0)) // user 1 gets a newer value
    q.processAllAvailable()
    q.stop()
    assert(snaps.size == 2)
    assert(snaps(0) == Map(1L -> 1.0, 2L -> 5.0))
    assert(snaps(1) == Map(1L -> 7.0, 2L -> 5.0)) // latest wins after tick 2
  }
}
