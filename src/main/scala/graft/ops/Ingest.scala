package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's ingest shaping (`etl/crypto_etl.py:70-127`): project the
  * five fields, drop rows missing key/name/price, lowercase the key, coerce
  * numerics, stamp ONE batch-constant timestamp on every row of the tick
  * (`etl/crypto_etl.py:82` — batch-constant, not per-row, which is what
  * guarantees the max-ts ties the latest-per-key join form emits).
  *
  * Pure DataFrame→DataFrame so the exact same function runs in batch and
  * inside `foreachBatch` on a stream (graft.streaming.Streams).
  */
object Ingest {

  /** Target schema of the shaped `prices` table (FIXTURES.md §A). */
  val pricesSchema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("current_price", DoubleType, nullable = false),
    StructField("market_cap", DoubleType, nullable = true),
    StructField("total_volume", DoubleType, nullable = true),
    StructField("timestamp", TimestampType, nullable = false)))

  /** shapeBatch plus a quarantine channel: rows failing validation are
    * RETURNED (with a reject reason), not silently dropped — at pipeline
    * scale the reject rate is a monitored signal and silently vanishing
    * rows are an incident. The two frames share one logical plan over the
    * source; a caller materializing both should persist the input batch
    * first (each action otherwise re-reads the source). */
  def shapeBatchWithRejects(raw: DataFrame, batchTs: Timestamp): (DataFrame, DataFrame) = {
    val reason = when(col("symbol").isNull, "null_symbol")
      .when(col("name").isNull, "null_name")
      .when(col("current_price").isNull, "null_price")
    val tagged = raw
      .select("symbol", "name", "current_price", "market_cap", "total_volume")
      .withColumn("__reject", reason)
    val rejects = tagged.filter(col("__reject").isNotNull)
      .withColumnRenamed("__reject", "reject_reason")
    (shapeBatch(tagged.filter(col("__reject").isNull).drop("__reject"), batchTs),
      rejects)
  }

  /** P1–P5 + P4 batch stamp (SURVEY.md §2.2) over a raw quote batch. */
  def shapeBatch(raw: DataFrame, batchTs: Timestamp): DataFrame =
    shapeCore(raw).withColumn("timestamp", lit(batchTs))

  /** The same P1–P5 shaping over a `graft-ticks` DSv2 batch: the stamp
    * is each row's TICK time (`timestamp_millis(tick_ms)`) rather than
    * one caller-supplied literal — TICK-constant, not batch-constant.
    * That is the correct generalization of P4 once a micro-batch can
    * span several ticks (catch-up after downtime): every tick keeps its
    * own poll timestamp, so the max-ts tie semantics the latest-per-key
    * join form depends on hold PER TICK, exactly as they did when one
    * poll was one batch. */
  def shapeTicks(raw: DataFrame): DataFrame =
    shapeCore(raw.withColumn("timestamp", timestamp_millis(col("tick_ms"))))
      .select("symbol", "name", "current_price", "market_cap",
        "total_volume", "timestamp")

  /** Shared projection/validation/normalization (P1–P3, P5) — one body
    * so the batch-stamped and tick-stamped shapes cannot drift. */
  private def shapeCore(raw: DataFrame): DataFrame =
    raw
      .select((Seq("symbol", "name", "current_price", "market_cap",
        "total_volume") ++ raw.columns.filter(_ == "timestamp")).map(col): _*)
      .filter(col("symbol").isNotNull && col("name").isNotNull &&
        col("current_price").isNotNull)
      .withColumn("symbol", lower(col("symbol")))
      .withColumn("current_price", col("current_price").cast(DoubleType))
      .withColumn("market_cap", col("market_cap").cast(DoubleType))
      .withColumn("total_volume", col("total_volume").cast(DoubleType))
}
