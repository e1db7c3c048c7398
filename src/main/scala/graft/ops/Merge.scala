package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE INTO (the CDC apply step): a keyed base snapshot merged
  * with a last-wins change set — matched rows update, unmatched changes
  * insert, delete-flagged changes remove the key (whether or not it is
  * matched). This is the batch form of what the reference's ETL does
  * row-at-a-time with `INSERT ... ON CONFLICT DO UPDATE`
  * (`etl/crypto_etl.py:118-131`), re-expressed as ONE full-outer
  * equi-join on the key: at 100 TB both sides shuffle-partition by the
  * key once (or co-locate for free when base and changes are bucketed
  * alike), and the merge decision is a per-row `CASE` — no driver loop,
  * no per-key RPC.
  */
object Merge {

  /** Apply `changes` (one row per key — dedup a feed to last-wins
    * first; a `deleteCol` boolean marks tombstones) onto `base` (one row
    * per key). Every non-key column of `base` must exist in `changes`;
    * matched/inserted rows take the change-side values. Emits the merged
    * snapshot plus a `status` column (`kept` / `updated` / `inserted`) —
    * deleted keys are absent.
    */
  /** "What changed between two keyed state generations": full-outer
    * diff with null-safe equality, so insert-shaped (key only in new)
    * and delete-shaped (key only in old) differences are flagged too.
    * Each side is a |keys|-sized scan — reading committed snapshot
    * generations, never replaying the log. Shared by the q_time_travel
    * query and the Graft.snapshotDiff facade (one implementation, so
    * the equality semantics cannot drift). */
  def generationDiff(oldGen: DataFrame, newGen: DataFrame, key: String,
                     valueCol: String, oldName: String,
                     newName: String): DataFrame =
    oldGen.select(col(key), col(valueCol).as(oldName))
      .join(newGen.select(col(key), col(valueCol).as(newName)),
        Seq(key), "full_outer")
      .withColumn("changed", !(col(oldName) <=> col(newName)))

  def mergeInto(base: DataFrame, changes: DataFrame, key: String,
                deleteCol: String): DataFrame = {
    val dataCols = base.columns.filter(_ != key).toSeq
    val ch = changes.select(
      (col(key) +: dataCols.map(c => col(c).as(s"__c_$c"))
        :+ col(deleteCol).as("__del") :+ lit(true).as("__in_ch")): _*)
    base.withColumn("__in_base", lit(true))
      .join(ch, Seq(key), "full_outer")
      // tombstones drop the key whether matched or not; a delete for an
      // absent key is a no-op (standard MERGE WHEN MATCHED THEN DELETE
      // plus ignore-unmatched-delete semantics)
      .filter(!coalesce(col("__del"), lit(false)))
      .select(
        col(key) +:
          dataCols.map(c =>
            when(col("__in_ch").isNotNull, col(s"__c_$c"))
              .otherwise(col(c)).as(c)) :+
          when(col("__in_base").isNull, lit("inserted"))
            .when(col("__in_ch").isNull, lit("kept"))
            .otherwise(lit("updated")).as("status"): _*)
  }
}
