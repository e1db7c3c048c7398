package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed dense global rank (1..n) in `sortCols` order WITHOUT a
  * single-partition window — the scale-safe twin of
  * `row_number() OVER (ORDER BY ...)`.
  *
  * Construction: range-repartition on the sort keys (so partitions hold
  * contiguous key ranges), rank within each physical partition, then add
  * per-partition row-count offsets. The offset table is one row per
  * partition — bounded scheduler metadata, the same size class as the
  * broadcast grids elsewhere — so its tiny ordered cumsum window is a
  * metadata pass, never a data pass. The result is INDEPENDENT of the
  * partitioning: sort keys must be unique (`sortCols` should end in a
  * tiebreaker id), so every row's rank is determined by the key order
  * alone, wherever the range boundaries land.
  *
  * The range-partitioned frame is pinned with an eager localCheckpoint:
  * the rank pass and the count pass MUST observe the same partition
  * assignment (range partitioning samples its boundaries; an
  * unmaterialized plan could re-sample between the two reads).
  */
object GlobalRank {

  def withGlobalRank(df: DataFrame, out: String,
                     sortCols: Column*): DataFrame = {
    val parted = df.repartitionByRange(sortCols: _*)
      .withColumn("__grk_pid", spark_partition_id())
      .localCheckpoint(eager = true)
    val counts = parted.groupBy(col("__grk_pid"))
      .agg(count(lit(1)).as("__grk_c"))
    val wOff = Window.orderBy(col("__grk_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__grk_off", coalesce(sum(col("__grk_c")).over(wOff), lit(0L)))
      .select(col("__grk_pid"), col("__grk_off"))
    val wLocal = Window.partitionBy(col("__grk_pid")).orderBy(sortCols: _*)
    parted
      .withColumn("__grk_lr", row_number().over(wLocal))
      .join(broadcast(offsets), Seq("__grk_pid"))
      .withColumn(out, col("__grk_off") + col("__grk_lr"))
      .drop("__grk_pid", "__grk_lr", "__grk_off")
  }
}
