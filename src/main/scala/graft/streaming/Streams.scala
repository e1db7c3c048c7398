package graft.streaming

import graft.ops.Latest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Row shape shared by the typed stateful operators. ts is LocalDateTime
  * so the encoder maps to TIMESTAMP_NTZ — composing with `eventSchema`
  * (a java.sql.Timestamp field would encode LTZ and fail the up-cast). */
case class EventRow(event_id: Long, ts: java.time.LocalDateTime, user_id: Long,
                    event_type: String, value: Double, props: String)

/** Per-key state of the incremental latest-snapshot operator. */
case class LatestState(maxTsMicros: Long, eventId: Long, value: Double)

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

  /** Streaming sessionization: event-time session windows with a gap
    * timeout; watermark bounds the open-session state and closes sessions
    * for append-mode emission. Batch twin: graft.ops.Sessionize. */
  def streamingSessions(df: DataFrame, gap: String, delay: String): DataFrame =
    df.withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Incremental latest-per-key via explicit keyed state
    * (flatMapGroupsWithState) — the §7.4.4 alternative to per-tick
    * recomputation: state is ONE row per key (bounded by |keys|, not by
    * history), and a micro-batch emits only keys whose latest row
    * changed — exactly the delta the reference's WS broadcast needs. */
  def incrementalLatest(ds: Dataset[EventRow]): Dataset[(Long, Long, Double)] = {
    import ds.sparkSession.implicits._
    def micros(t: java.time.LocalDateTime): Long =
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[EventRow], state: GroupState[LatestState]) =>
          val incoming = events.maxByOption(e => (micros(e.ts), e.event_id))
          val current = state.getOption
          incoming match {
            case Some(e) =>
              val cand = LatestState(micros(e.ts), e.event_id, e.value)
              val newer = current.forall(c =>
                cand.maxTsMicros > c.maxTsMicros ||
                  (cand.maxTsMicros == c.maxTsMicros && cand.eventId > c.eventId))
              if (newer) {
                state.update(cand)
                Iterator((user, cand.eventId, cand.value))
              } else Iterator.empty
            case None => Iterator.empty
          }
      }
  }

  /** Stream-stream interval join: purchases matched to the same user's
    * clicks within the preceding `windowSeconds` — both sides watermarked
    * so the join state is bounded and eventually purged. The attribution
    * join every event pipeline grows into. */
  def purchaseAttribution(events: DataFrame, windowSeconds: Long,
                          delay: String): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
      .withWatermark("p_ts", delay)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", delay)
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowSeconds SECONDS"))
      .select("user_id", "purchase_id", "click_id", "p_ts", "c_ts", "purchase_value")
  }

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
