package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-row-per-key — the reference's signature query
  * (`api/server.js:67-77`: `prices t1 JOIN (SELECT symbol, MAX(timestamp)
  * ... GROUP BY symbol) t2`). Two semantics, both needed (SURVEY.md §7.4.1):
  *
  *  - join form: emits EVERY row tied at the max timestamp (reference
  *    behavior — ties are guaranteed there because the batch timestamp is
  *    shared, `etl/crypto_etl.py:82`);
  *  - window form: exactly one row per key, deterministic via tiebreakers
  *    (what the frontend's Map-dedup ends up with, `frontend/src/App.js:182-186`).
  *
  * Scale notes: the join form shuffles only (key, max_ts) pairs on the agg
  * side — partial aggregation makes the build side |keys|-sized, so it is
  * broadcast-able whenever the key universe is small (the reference's is
  * ~100 symbols). The window form is one shuffle on the key and streams
  * each partition once — preferred when |keys| is huge (no broadcast, no
  * join).
  */
object Latest {

  /** Join form; emits all max-ts ties. `broadcastKeys` should be true when
    * the distinct-key universe fits in an executor (dims, symbol tables). */
  def latestPerKeyJoin(df: DataFrame, key: String, tsCol: String,
                       broadcastKeys: Boolean = true): DataFrame = {
    val agg0 = df
      .select(col(key).as("__k"), col(tsCol).as("__t"))
      .groupBy("__k").agg(max("__t").as("__max_t"))
    val agg = if (broadcastKeys) broadcast(agg0) else agg0
    df.join(agg, col(key) === col("__k") && col(tsCol) === col("__max_t"))
      .drop("__k", "__max_t")
  }

  /** Window form; exactly one row per key. `order` must be a total order
    * within each key (include a unique tiebreaker) for determinism. */
  def latestPerKeyWindow(df: DataFrame, keys: Seq[String], order: Column*): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** As-of lookup: for each (key, probe_ts) in `probes`, the latest row of
    * `facts` with ts <= probe_ts (left semantics: null when none).
    *
    * Implemented as a union + running `last(ignoreNulls)` window — a single
    * sort-based shuffle on the key, no join, no per-probe scan. This is the
    * plan that survives scale: both sides co-partition on the key and each
    * partition is streamed once in time order (contrast a correlated
    * subquery or a range cross-join, both quadratic).
    *
    * The fact value rides inside a single-field struct: the STRUCT is
    * non-null for every fact row even when the value itself is null, so
    * `last(ignoreNulls)` always lands on the matched row and a matched
    * fact's own NULL value is emitted as NULL — identical to the native
    * exec and to a correlated-subquery oracle. (Carrying the bare value
    * would silently fall back to an earlier non-null fact.)
    */
  def asOfJoin(facts: DataFrame, probes: DataFrame, key: String,
               tsCol: String, probeTsCol: String, valueCol: String,
               tieBreak: String): DataFrame = {
    val tsType = facts.schema(tsCol).dataType
    val vWrapType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", facts.schema(valueCol).dataType)))
    val evt = facts.select(
      col(key), col(tsCol).as("__t"), struct(col(valueCol).as("v")).as("__vw"),
      lit(0).as("__is_probe"), lit(null).cast(tsType).as(probeTsCol),
      col(tieBreak).as("__tb"))
    val prb = probes.select(
      col(key), col(probeTsCol).cast(tsType).as("__t"),
      lit(null).cast(vWrapType).as("__vw"),
      lit(1).as("__is_probe"), col(probeTsCol).cast(tsType),
      lit(null).cast(facts.schema(tieBreak).dataType).as("__tb"))
    // Probe rows sort after fact rows at equal ts (as-of is inclusive);
    // among equal-ts facts the greatest tiebreaker wins, with a NULL
    // tiebreaker sorting last (= winning) — pinned identical to the
    // native exec's NullsLast requiredChildOrdering.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__is_probe").asc, col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    evt.unionByName(prb)
      .withColumn("__asof", last(col("__vw"), ignoreNulls = true).over(w))
      .filter(col("__is_probe") === 1)
      .select(col(key), col(probeTsCol),
        col("__asof").getField("v").as(s"asof_$valueCol"))
  }

  /** Native-operator form of [[asOfJoin]] — same contract, executed by
    * graft's whole-plan AsofJoinExec (a co-partitioned single-pass
    * merge; see graft.plans.AsofJoin for the scale rationale). Output is
    * the FULL probe schema (extra probe columns pass through untouched)
    * plus the `asof_` columns. Prefer this form when probes carry many
    * columns: the union form widens EVERY fact row to the probe schema
    * before the shuffle, while the native exec ships each side as-is.
    */
  def asOfJoinNative(facts: DataFrame, probes: DataFrame, key: String,
                     tsCol: String, probeTsCol: String, valueCol: String,
                     tieBreak: String): DataFrame =
    asOfJoinNativeValues(facts, probes, key, tsCol, probeTsCol,
      Seq(valueCol), tieBreak)

  /** Multi-column native as-of: every column in `valueCols` comes back
    * as `asof_<name>`, all read from the SAME matched fact row (one
    * merge, one buffered row — not one lookup per column, and never a
    * mix of columns from different facts). */
  def asOfJoinNativeValues(facts: DataFrame, probes: DataFrame, key: String,
                           tsCol: String, probeTsCol: String,
                           valueCols: Seq[String], tieBreak: String,
                           toleranceMicros: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.graft.Bridge
    require(valueCols.nonEmpty, "as-of needs at least one value column")
    val tsType = facts.schema(tsCol).dataType
    // Prune the fact side to what the join reads (a generic node gets no
    // ColumnPruning from the optimizer) and RE-ALIAS it: fresh exprIds
    // decouple the fact side from a probe side derived from the same
    // scan — the self-as-of case a generic binary node cannot rely on
    // the analyzer to deduplicate.
    val factsPruned = facts.select(col(key) +: col(tsCol) +: col(tieBreak) +:
      valueCols.map(col): _*)
    // The probe side passes through AS-IS (only the probe ts is cast):
    // AsofJoinExec emits left.output verbatim, so every extra probe
    // column rides along — this is what makes the native form cheaper
    // than the union form for wide probes (the union form widens every
    // FACT row to the probe schema before the shuffle).
    val probesCast = probes.withColumn(probeTsCol, col(probeTsCol).cast(tsType))
    val leftPlan = Bridge.analyzed(probesCast)
    val rightBase = Bridge.analyzed(factsPruned)
    val rightAliases = rightBase.output.map(a => Alias(a, a.name)())
    val rightPlan = Project(rightAliases, rightBase)
    val rKey +: rTs +: rTb +: rVals = rightAliases.map(_.toAttribute)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String): Attribute = p.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column $name not found"))
    val lKey = attr(leftPlan, key); val lTs = attr(leftPlan, probeTsCol)
    require(lKey.dataType == rKey.dataType,
      s"as-of key types differ: ${lKey.dataType} vs ${rKey.dataType}")
    val outVals = valueCols.zip(rVals).map { case (n, a) =>
      AttributeReference(s"asof_$n", a.dataType, nullable = true)()
    }
    val node = graft.plans.AsofJoin(leftPlan, rightPlan, lKey, rKey, lTs, rTs,
      rTb, rVals, outVals, toleranceMicros)
    Bridge.ofRows(facts.sparkSession, node)
  }

  /** Tolerance-bounded as-of (union+window form): the latest fact at or
    * before each probe time, nulled when that fact is MORE than
    * `tolMicros` older than the probe — i.e. the latest fact within
    * [probe − tol, probe], pandas merge_asof's `tolerance`. Same
    * tie-break and null semantics as [[asOfJoin]]; the matched fact's
    * ts rides inside the window struct so the gap check reads the SAME
    * row the value came from. For integer time columns the tolerance is
    * in the column's own units (mirroring the native exec). */
  def asOfJoinTol(facts: DataFrame, probes: DataFrame, key: String,
                  tsCol: String, probeTsCol: String, valueCol: String,
                  tieBreak: String, tolMicros: Long): DataFrame = {
    val tsType = facts.schema(tsCol).dataType
    val vWrapType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", facts.schema(valueCol).dataType),
      org.apache.spark.sql.types.StructField("t", tsType)))
    val evt = facts.select(
      col(key), col(tsCol).as("__t"),
      struct(col(valueCol).as("v"), col(tsCol).as("t")).as("__vw"),
      lit(0).as("__is_probe"), lit(null).cast(tsType).as(probeTsCol),
      col(tieBreak).as("__tb"))
    val prb = probes.select(
      col(key), col(probeTsCol).cast(tsType).as("__t"),
      lit(null).cast(vWrapType).as("__vw"),
      lit(1).as("__is_probe"), col(probeTsCol).cast(tsType),
      lit(null).cast(facts.schema(tieBreak).dataType).as("__tb"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__is_probe").asc, col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    evt.unionByName(prb)
      .withColumn("__asof", last(col("__vw"), ignoreNulls = true).over(w))
      .filter(col("__is_probe") === 1)
      .select(col(key), col(probeTsCol),
        when(col("__asof").getField("t") >= {
          import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
          tsType match {
            case TimestampNTZType | TimestampType =>
              col(probeTsCol) - expr(s"INTERVAL $tolMicros MICROSECOND")
            case _ => col(probeTsCol) - lit(tolMicros)
          }
        }, col("__asof").getField("v")).as(s"asof_$valueCol"))
  }
}
