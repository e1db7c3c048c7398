package graft

import org.apache.spark.sql.SparkSession

/** Shared helpers for the two single-session harness mains (Bench,
  * Verify). */
object Harness {

  /** Drop EVERY cached block in the session — CacheManager entries
    * (plan-level persists) AND RDD-level blocks clearCache cannot see
    * (localCheckpoint generations from the iterative graph queries).
    *
    * INVARIANT (both call sites): this unpersists localCheckpoint'd
    * RDDs too, which permanently destroys them — their lineage is
    * truncated, so they cannot be recomputed and a later action on a
    * frame that still references one throws "checkpoint block not
    * found". Safe here ONLY because the harness is single-threaded and
    * every intermediate that outlives a harness line is parquet-backed
    * (Extensions.memoStore / Stores.materialized), never cached: a
    * query/chain body may persist or checkpoint whatever it likes
    * INSIDE its line, but nothing cached may be referenced across a
    * sweep. Do not call this from concurrent code or a long-lived user
    * session. */
  def sweepStorage(spark: SparkSession): Unit = {
    try spark.catalog.clearCache()
    catch { case scala.util.control.NonFatal(_) => }
    spark.sparkContext.getPersistentRDDs.values.foreach(r =>
      try r.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => })
  }
}
