package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top-K + "Other" rollup and percent-of-total — the dashboard's doughnut
  * prep, done client-side in the reference (`frontend/src/App.js:97-142`:
  * sort desc → slice(0,7) → sum the remainder into one "Other" bucket →
  * percent-of-total in the tooltip).
  *
  * Scale notes: the top-K side compiles to `TakeOrderedAndProject`
  * (per-partition heap + driver merge of K rows — no global sort), and the
  * remainder is a left-anti join against the K-row set (broadcast) followed
  * by a partial+final aggregate. Nothing here materializes a global sort or
  * a single-partition window, so the same plan holds at 1000 executors.
  */
object TopK {

  /** `df` must be pre-aggregated (one row per key). Keeps the top `k` rows
    * by (`valueCol` desc nulls last, `keyCol` asc) and rolls every other
    * row into one `otherLabel` row summing `valueCol`. No remainder → no
    * "Other" row (reference guard, `frontend/src/App.js:105,125`).
    * `keyCol` must be a string column (the rollup label shares it).
    */
  def topKPlusOther(df: DataFrame, keyCol: String, valueCol: String, k: Int,
                    otherLabel: String = "Other"): DataFrame = {
    // The pre-agg feeds THREE consumers (top-K, the anti-join remainder,
    // and — in the typical percent-of-total composition — the grand
    // total); persisted so the upstream aggregation runs once, not three
    // times. Safe at scale: `df` is one row per key by contract, i.e.
    // already aggregate-sized, and MEMORY_AND_DISK spills. Lifecycle:
    // the cache lives inside the returned plan for the session; looping
    // callers should spark.catalog.clearCache() between corpora (same
    // note as the Dedup posting-list caches).
    val keyed = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val top = keyed.orderBy(col(valueCol).desc_nulls_last, col(keyCol).asc).limit(k)
    val other = keyed
      .join(broadcast(top.select(keyCol)), Seq(keyCol), "left_anti")
      .agg(sum(col(valueCol)).as(valueCol))
      .filter(col(valueCol).isNotNull)
      .select(lit(otherLabel).as(keyCol), col(valueCol))
    top.select(keyCol, valueCol).unionByName(other)
  }

  /** Adds `pctCol` = value / total * 100, rounded to `scale`. The grand
    * total is a scalar aggregate broadcast back over the rows — not a
    * global (single-partition) window, so it distributes.
    */
  def withPercentOfTotal(df: DataFrame, valueCol: String,
                         pctCol: String = "pct", scale: Int = 2): DataFrame = {
    val total = df.agg(sum(col(valueCol)).as("__total"))
    df.crossJoin(broadcast(total))
      // (100 * v) / total, matching the oracle's evaluation order exactly —
      // (v / total) * 100 can differ in the last ulp and flip the rounding
      .withColumn(pctCol, round(lit(100) * col(valueCol) / col("__total"), scale))
      .drop("__total")
  }

  /** Top-N rows per group by `order` (must totally order within a group). */
  def topNPerGroup(df: DataFrame, groupCols: Seq[String], n: Int, order: Column*): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= n)
      .withColumnRenamed("__rn", "rn_in_group")
  }
}
