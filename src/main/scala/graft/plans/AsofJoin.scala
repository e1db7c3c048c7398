package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, GenericInternalRow, JoinedRow, NullsLast, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native as-of join — the whole-operator tier of graft's extension
  * surface (logical node → strategy → physical exec, injected through
  * GraftExtensions), for the one relational operator the reference's
  * domain leans on that Spark has no first-class form of: "for each
  * probe (key, t), the latest fact row with fact.ts <= t"
  * (api/server.js:67-77 is the t = now special case; a backtest or
  * repricing job asks it at many historical t).
  *
  * Semantics (pinned equal to graft.ops.Latest.asOfJoin by spec):
  * left-outer — every probe row is emitted once; the as-of columns are
  * null when the key has no fact at or before the probe time. Among
  * equal-ts facts the greatest tie-break wins. Null probe key or null
  * probe time matches nothing (SQL comparison semantics); null fact
  * ts/key rows never match.
  *
  * Physical form: both sides hash-cluster on the key and sort inside
  * each partition — probes by (key, t), facts by (key, ts, tieBreak) —
  * then ONE forward merge pass per partition emits every probe. Each
  * side is shuffled exactly once, the fact side is never re-scanned per
  * probe, and peak memory is a single buffered fact row: the plan a
  * 100 TB backtest needs (contrast a per-probe correlated scan, or a
  * range cross-join, both quadratic). Distribution/ordering are
  * REQUIREMENTS, not re-implementations: EnsureRequirements plants the
  * exchanges/sorts, so AQE re-planning, partition coalescing, and
  * exchange reuse all apply as they would to a built-in sort-merge join.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightTieBreak: Attribute,
    rightValues: Seq[Attribute],
    outputValues: Seq[Attribute],
    tolerance: Option[Long] = None)
  extends BinaryNode {

  require(rightValues.length == outputValues.length,
    "one output attribute per right value column")

  override def output: Seq[Attribute] = left.output ++ outputValues

  // outputValues are minted by this node, not read from the children —
  // without this, missingInput is non-empty and analysis fails.
  override def producedAttributes: AttributeSet = AttributeSet(outputValues)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy for graft's custom plan nodes (GraftExtensions
  * injects it ahead of the built-in strategies). */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsofJoin =>
      AsofJoinExec(j.leftKey, j.rightKey, j.leftTime, j.rightTime,
        j.rightTieBreak, j.rightValues, j.outputValues,
        planLater(j.left), planLater(j.right), j.tolerance) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned merge execution of [[AsofJoin]].
  *
  * requiredChildDistribution/Ordering declare what the merge needs and
  * let EnsureRequirements supply it (or elide it when a child is
  * already clustered — e.g. a bucketed fact table joins with ZERO
  * shuffles). doExecute then zips partitions and walks both sorted
  * iterators forward once:
  *
  *  - the fact cursor advances while its (key, ts) is at or before the
  *    probe's (key, t), remembering the last same-key candidate — which
  *    the (ts, tieBreak) sort makes the max-ts-then-max-tieBreak row;
  *  - the buffered candidate is one row, copied out of the iterator's
  *    reused buffer (an UnsafeRow iterator recycles backing memory, so
  *    both the row AND the key re-read from it must come from the copy);
  *  - probes with no candidate emit null as-of columns via a prebuilt
  *    all-null right row.
  *
  * Cost per partition: O(|probes| + |facts|) comparisons, one buffered
  * row, zero allocation per probe beyond the unsafe projection's reused
  * buffer.
  */
case class AsofJoinExec(
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightTieBreak: Attribute,
    rightValues: Seq[Attribute],
    outputValues: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan,
    tolerance: Option[Long] = None)
  extends BinaryExecNode {

  // The tolerance gap is probe_t − fact_ts in the time column's OWN
  // physical units (micros for timestamps, days for dates, raw for
  // longs), so it only supports integer-backed time types — checked at
  // plan time, not mid-merge.
  tolerance.foreach { _ =>
    import org.apache.spark.sql.types._
    require(Seq[DataType](TimestampType, TimestampNTZType, LongType,
      IntegerType, DateType).contains(leftTime.dataType),
      s"as-of tolerance needs an integer-backed time type, " +
        s"got ${leftTime.dataType}")
  }

  override def output: Seq[Attribute] = left.output ++ outputValues
  override def producedAttributes: AttributeSet = AttributeSet(outputValues)

  // One probe row in → one row out, in the probe side's order.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  // Tie-break sorts NULLS LAST (not Ascending's NullsFirst default) so a
  // null-tie-break fact WINS an equal-ts tie — pinned identical to the
  // union+window form's asc_nulls_last (Latest.asOfJoin).
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTieBreak, Ascending, NullsLast, Seq.empty)))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "probes with a match"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val lKeyOrd = lOut.indexWhere(_.exprId == leftKey.exprId)
    val lTimeOrd = lOut.indexWhere(_.exprId == leftTime.exprId)
    val rKeyOrd = rOut.indexWhere(_.exprId == rightKey.exprId)
    val rTimeOrd = rOut.indexWhere(_.exprId == rightTime.exprId)
    require(lKeyOrd >= 0 && lTimeOrd >= 0 && rKeyOrd >= 0 && rTimeOrd >= 0,
      s"as-of join columns must come from the join children " +
        s"(ordinals $lKeyOrd/$lTimeOrd/$rKeyOrd/$rTimeOrd)")
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val rWidth = rOut.length
    // The outer side of the merge feeds an ALL-NULL right row through the
    // projection, so the right attributes must be bound nullable even when
    // the child schema says otherwise — a non-nullable binding elides the
    // null check and reads 0/"" instead of null.
    val projExprs = lOut ++ rightValues.map(_.withNullability(true))
    val inputAttrs = lOut ++ rOut.map(_.withNullability(true))

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrdering = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrdering = TypeUtils.getInterpretedOrdering(timeType)
      val proj = UnsafeProjection.create(projExprs, inputAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rWidth)
      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      def advance(): Unit = { rRow = if (rIter.hasNext) rIter.next() else null }
      var matched: InternalRow = null
      var matchedKey: Any = null
      var matchedTime: Any = null
      // integer-backed time readout for the tolerance gap (types checked
      // at plan time)
      def timeAsLong(v: Any): Long = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }

      lIter.map { lRow =>
        val lkNull = lRow.isNullAt(lKeyOrd)
        val ltNull = lRow.isNullAt(lTimeOrd)
        if (lkNull || ltNull) {
          numOutputRows += 1
          proj(joined(lRow, nullRight))
        } else {
          val lk = lRow.get(lKeyOrd, keyType)
          val lt = lRow.get(lTimeOrd, timeType)
          if (matched != null && keyOrdering.compare(matchedKey, lk) != 0) {
            matched = null
          }
          var done = false
          while (!done && rRow != null) {
            if (rRow.isNullAt(rKeyOrd)) advance() // null fact keys sort first, never match
            else {
              val cmp = keyOrdering.compare(rRow.get(rKeyOrd, keyType), lk)
              if (cmp < 0) advance()
              else if (cmp > 0) done = true
              else if (rRow.isNullAt(rTimeOrd)) advance() // null ts never matches
              else if (timeOrdering.compare(rRow.get(rTimeOrd, timeType), lt) <= 0) {
                matched = rRow.copy() // iterator recycles its buffer
                matchedKey = matched.get(rKeyOrd, keyType)
                matchedTime = matched.get(rTimeOrd, timeType)
                advance()
              } else done = true
            }
          }
          numOutputRows += 1
          // tolerance: a candidate older than probe_t − tol scores as no
          // match for THIS probe but stays buffered — a later probe of
          // the same key may still be within tol of a newer fact
          val inTol = matched != null && tolerance.forall(t =>
            timeAsLong(lt) - timeAsLong(matchedTime) <= t)
          if (inTol) {
            numMatched += 1
            proj(joined(lRow, matched))
          } else proj(joined(lRow, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
