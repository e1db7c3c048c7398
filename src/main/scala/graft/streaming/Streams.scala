package graft.streaming

import graft.ops.Latest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming layer. The reference is a hand-rolled micro-batch
  * pipeline — fetch every 300 s, append one batch-stamped tick, notify,
  * re-query latest snapshot, broadcast (`etl/crypto_etl.py:150-157`,
  * `api/server.js:166-200`). Structured Streaming formalizes exactly that:
  * trigger → append → `foreachBatch` snapshot → sink callback.
  *
  * Every transform here is a plain DataFrame→DataFrame function, so the
  * SAME code path serves batch backfill and the live stream (tested for
  * parity in StreamingSpec). State discipline for scale: windowed aggs
  * carry watermarks so state is bounded and late data has defined
  * semantics; snapshot maintenance uses `foreachBatch` recomputation over
  * the accumulated store (the reference's own architecture) rather than
  * unbounded `complete`-mode state.
  */
object Streams {

  /** events-shaped schema for file/socket stream sources (FIXTURES.md §B). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Ingest shaping, stream/batch agnostic (the ETL tick's P1–P3/P5:
    * project, validate, normalize key case, coerce). */
  def shapeEvents(df: DataFrame): DataFrame =
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .filter(col("event_id").isNotNull && col("ts").isNotNull &&
        col("user_id").isNotNull && col("value").isNotNull)
      .withColumn("event_type", lower(col("event_type")))

  /** Tumbling event-time aggregate with bounded state: counts + sums per
    * (window, event_type). On a stream, rows later than `delay` past the
    * max seen event time are dropped and closed windows are emitted
    * (append mode); on a batch frame the same expression just aggregates. */
  def windowedStats(df: DataFrame, width: String, delay: String): DataFrame = {
    val withWm =
      if (df.isStreaming) df.withWatermark("ts", delay) else df
    withWm
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Streaming dedup-by-key with bounded state — the D1 Map-dedup analog.
    * Keeps the FIRST arrival per (user_id, event_id) within the watermark. */
  def dedupWithinWatermark(df: DataFrame, delay: String): DataFrame =
    df.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("user_id", "event_id")

  /** Latest-per-key snapshot over an accumulated store — what the
    * reference recomputes and broadcasts on every notify
    * (`api/server.js:166-193`). */
  def latestSnapshot(accumulated: DataFrame): DataFrame =
    Latest.latestPerKeyWindow(accumulated, Seq("user_id"),
        col("ts").desc, col("event_id").desc)
      .orderBy(col("value").desc_nulls_last, col("user_id").asc)

  /** The reference's full tick, as one streaming query: append each
    * micro-batch to `storePath` (parquet), recompute the latest snapshot,
    * hand it to `onSnapshot` (the WS-broadcast seam, S4/S5). Exactly-once:
    * parquet append + deterministic recompute make replayed batches
    * idempotent at the snapshot level. */
  def startSnapshotStream(spark: SparkSession, source: DataFrame,
                          storePath: String, checkpoint: String,
                          trigger: Trigger = Trigger.ProcessingTime("5 minutes"))
                         (onSnapshot: (DataFrame, Long) => Unit): StreamingQuery =
    shapeEvents(source).writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("append").parquet(storePath)
        val snap = latestSnapshot(batch.sparkSession.read.parquet(storePath))
        onSnapshot(snap, batchId)
      }
      .start()
}
