package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands over a keyed event log: consecutive-day activity
  * runs detected with the day-minus-row-number grouping constant — one
  * window over the key partition, no self-join against shifted copies.
  *
  * Scale shape: the explicit `repartition(key)` makes the whole
  * pipeline (distinct days, window, both aggregates) share ONE hash
  * exchange — hash(key) satisfies the (key, day) distinct clustering
  * and every downstream requirement (PlanSpec-pinned). All date math is
  * integer day counts against a fixed epoch, so island boundaries are
  * engine-independent by construction.
  */
object Streaks {

  /** Per-key streak summary: number of distinct-day activity islands,
    * the longest island, and total active days. */
  def streakSummary(events: DataFrame, keyCol: String,
                    tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    events
      .select(col(keyCol), col(tsCol).cast("date").as("day"))
      .repartition(col(keyCol))
      .distinct()
      .withColumn("grp",
        expr("datediff(day, DATE'1970-01-01')") - row_number().over(w))
      .groupBy(col(keyCol), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_streaks"),
        max(col("len")).as("max_streak"),
        sum(col("len")).as("n_active_days"))
  }
}
