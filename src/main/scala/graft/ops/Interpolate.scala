package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linear interpolation of a per-key time series at probe timestamps —
  * gap-filling for charting/resampling (the natural generalization of the
  * as-of lookup: as-of takes the left neighbor, interpolation blends both).
  *
  * Same single-shuffle plan as `Latest.asOfJoin`: union probes into the
  * fact stream, window partitioned by key ordered by time; the left
  * neighbor is a running `last(ignoreNulls)`, and the right neighbor the
  * same running-last over the REVERSED order with a strictly-before
  * frame. Both directions are incrementally-growing frames Spark
  * evaluates in O(n) per partition — the naive `first(...) OVER (ROWS
  * BETWEEN 1 AND UNBOUNDED FOLLOWING)` is Spark's tail-rescan frame,
  * O(n²) per partition (the q_knn_shapley WindowExec trap). One shuffle,
  * two sorts of the same partitioning — never a per-probe scan.
  */
object Interpolate {

  /** For each (key, probe_ts): prev/next fact values and timestamps, and
    * the linearly interpolated value (endpoint value when one side is
    * missing, null when both are). */
  def linearAtProbes(facts: DataFrame, probes: DataFrame, key: String,
                     tsCol: String, valueCol: String, probeTsCol: String,
                     tieBreak: String): DataFrame = {
    val tsType = facts.schema(tsCol).dataType
    val evt = facts.select(
      col(key), col(tsCol).as("__t"), col(valueCol).as("__v"),
      lit(0).as("__is_probe"), col(tieBreak).as("__tb"))
    val prb = probes.select(
      col(key), col(probeTsCol).cast(tsType).as("__t"),
      lit(null).cast(facts.schema(valueCol).dataType).as("__v"),
      lit(1).as("__is_probe"),
      lit(null).cast(facts.schema(tieBreak).dataType).as("__tb"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__is_probe").asc, col("__tb").asc_nulls_last)
    val factV = when(col("__is_probe") === 0, col("__v"))
    val factT = when(col("__is_probe") === 0, unix_micros(col("__t").cast("timestamp")))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // next non-null neighbor = running last over the EXACT reverse order,
    // frame ending strictly before the current row. (1, unboundedFollowing)
    // on the ascending order is semantically identical but re-aggregates
    // the whole tail per row in Spark's UnboundedFollowing frame — O(n²).
    val wDesc = Window.partitionBy(col(key))
      .orderBy(col("__t").desc, col("__is_probe").desc,
        col("__tb").desc_nulls_first)
    val wNext = wDesc.rowsBetween(Window.unboundedPreceding, -1)
    val probeUs = unix_micros(col("__t").cast("timestamp"))
    val interp =
      when(col("__pv").isNull, col("__nv"))
        .when(col("__nv").isNull, col("__pv"))
        .when(col("__nt") === col("__pt"), col("__pv"))
        .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
          (probeUs - col("__pt")) / (col("__nt") - col("__pt")))
    evt.unionByName(prb)
      .withColumn("__pv", last(factV, ignoreNulls = true).over(wPrev))
      .withColumn("__pt", last(factT, ignoreNulls = true).over(wPrev))
      .withColumn("__nv", last(factV, ignoreNulls = true).over(wNext))
      .withColumn("__nt", last(factT, ignoreNulls = true).over(wNext))
      .filter(col("__is_probe") === 1)
      .select(col(key), col("__t").as(probeTsCol),
        round(interp, 4).as(s"interp_$valueCol"))
  }
}
