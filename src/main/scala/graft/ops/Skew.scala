package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation. A hot key (one symbol dominating the tick, one user
  * dominating the event log) turns a groupBy into a single straggler task
  * at cluster scale. Two standard remedies, both expressible as plan
  * rewrites around built-ins:
  *
  *  - salted two-phase aggregation for ALGEBRAIC aggregates: shard each
  *    key across `saltBuckets` partial groups, then merge the partials —
  *    the hot key's work spreads over `saltBuckets` tasks;
  *  - AQE's skew-join splitting (spark.sql.adaptive.skewJoin) for joins,
  *    which the engine leaves ON — salting joins manually is only needed
  *    when AQE is unavailable.
  */
object Skew {

  /** Salted count+sum aggregate per key: phase 1 groups on
    * (key, crc32(tiebreak) % salt) — crc of a per-row column, so rows of
    * one key spread deterministically — phase 2 merges partials per key.
    * Result equals the direct groupBy exactly for count/sum (algebraic),
    * modulo float summation order (callers round, as everywhere else). */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
                     shardCol: String, saltBuckets: Int): DataFrame =
    df.withColumn("__salt", pmod(crc32(col(shardCol).cast("string")), lit(saltBuckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum("__n").as("n"), sum("__s").as("sum_value"))

  /** Manually salted equi-join: `dim` replicates across `saltBuckets`
    * shards (explode — dim is the small side, the blow-up is bounded),
    * `fact` picks a deterministic shard from `shardCol`, and the join key
    * widens to (key, salt) — a hot key's probe rows spread over
    * `saltBuckets` tasks. Replication × disjoint fact shards partition
    * the matched pairs, so the result equals the plain equi-join row for
    * row. Prefer AQE skew-join splitting where available; this is the
    * explicit form for when it is not (or the skew is known a priori). */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                     dimKey: String, shardCol: String, saltBuckets: Int): DataFrame = {
    val f = fact.withColumn("__salt",
      pmod(crc32(col(shardCol).cast("string")), lit(saltBuckets)).cast("int"))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    f.join(d, f(factKey) === d(dimKey) && f("__salt") === d("__salt"))
      .drop("__salt")
  }
}
