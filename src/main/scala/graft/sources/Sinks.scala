package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sinks (SURVEY.md §2.1 S2/S4). The reference appends every tick into an
  * unpartitioned PG table and re-scans it per query — the §7.4.7 trap:
  * unbounded growth with no pruning. The 100 TB layout is date-partitioned
  * parquet: the latest-snapshot and history queries then prune to the
  * partitions their time filters select instead of scanning the full log.
  */
object Sinks {

  /** Append a batch into a date-partitioned parquet layout (partition
    * column derived from the event timestamp). Appends are idempotent at
    * the file level for re-run batches when callers pass a deterministic
    * batch id path; streaming exactly-once uses foreachBatch + checkpoint
    * (graft.streaming.Streams). */
  def appendDatePartitioned(df: DataFrame, path: String, tsCol: String): Unit =
    df.withColumn("event_date", col(tsCol).cast("date"))
      .write.mode("append")
      .partitionBy("event_date")
      .parquet(path)

  /** Range-clustered rewrite: `repartitionByRange` + sort-within on the
    * clustering columns, so every output file covers a DISJOINT range of
    * the key (asserted in SourceSinkSpec). Parquet min/max stats then
    * skip whole files/row-groups for range predicates — the layout that
    * lets a time-range query over a 100 TB event log read one file
    * instead of all of them, complementing partition pruning one level
    * below the partition grain. Range boundaries come from a sampled
    * sketch of the data (Spark's RangePartitioner), so skew in the
    * clustering key spreads across files instead of hot-spotting one. */
  def writeRangeClustered(df: DataFrame, path: String, numFiles: Int,
                          clusterCols: String*): Unit =
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Compact an append-grown store: streaming ingestion writes one
    * directory per micro-batch (plus one file per task), so after D days
    * at a 300 s cadence a store holds ~288·D tiny files per partition —
    * the small-files problem that kills scan throughput and driver
    * planning time at 100 TB. Compaction rewrites the accumulated rows
    * into `numFiles` right-sized files in ONE pass (coalesce, no
    * shuffle), into a fresh directory the caller then swaps in (write-
    * new-then-swap keeps readers of the old layout consistent; on object
    * stores the swap is a catalog/manifest pointer update). Run off the
    * hot path on a schedule. Returns the compacted row count. */
  def compactStore(spark: org.apache.spark.sql.SparkSession, storePath: String,
                   compactedPath: String, numFiles: Int): Long = {
    val rows = spark.read.parquet(storePath)
    rows.coalesce(numFiles).write.mode("overwrite").parquet(compactedPath)
    spark.read.parquet(compactedPath).count()
  }
}
