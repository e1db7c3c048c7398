package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule restoring predicate pushdown over nanosecond-precision
  * parquet timestamps.
  *
  * Spark cannot scan TIMESTAMP(NANOS) parquet natively; the engine reads
  * the column as long ns (`spark.sql.legacy.parquet.nanosAsLong`) and
  * converts with `timestamp_micros(ts div 1000)` (graft.Tables.events).
  * That derived expression is opaque to the parquet datasource, so time
  * filters — the MOST selective predicates on an event log, and the ones
  * partition pruning lives on at 100 TB — stop reaching the scan.
  *
  * The conversion is monotone (floor division by 1000 on non-negative
  * epochs), so comparisons rewrite exactly into the raw ns domain:
  *   µs(x div 1000) ≥ m  ⟺  x ≥ m·1000
  *   µs(x div 1000) >  m  ⟺  x >  m·1000 + 999
  *   µs(x div 1000) ≤  m  ⟺  x ≤  m·1000 + 999
  *   µs(x div 1000) <  m  ⟺  x <  m·1000
  *   µs(x div 1000) =  m  ⟺  m·1000 ≤ x ≤ m·1000 + 999
  * (timestamp literals' internal representation is µs since epoch; ×1000
  * stays far inside int64). Registered via GraftExtensions, runs after
  * constant folding, and turns the rewritten comparisons into plain
  * long-column predicates the parquet reader pushes to row-group stats.
  *
  * SESSION-TIMEZONE GUARD: the matched pattern may wrap the conversion in
  * Cast(TIMESTAMP → TIMESTAMP_NTZ), and that cast shifts the value by the
  * session timezone offset — the rewrite is only value-preserving when
  * the session zone is UTC (graft's canonical configuration, pinned by
  * Bench/Verify/tests). Under any other zone the rule is a no-op rather
  * than a silent off-by-offset filter. Also assumes non-negative epochs —
  * see TsLit.
  */
object NanosPushdown extends Rule[LogicalPlan] {

  /** True iff the session zone is fixed UTC (accepts "UTC", "Etc/UTC",
    * "+00:00", "Z" spellings via ZoneId normalization). */
  private def sessionIsUtc: Boolean =
    try {
      val rules = java.time.ZoneId.of(conf.sessionLocalTimeZone).getRules
      rules.isFixedOffset &&
        rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0
    } catch { case _: java.time.DateTimeException => false }

  /** Matches (possibly timestamp-cast-wrapped) timestamp_micros(x div 1000)
    * and yields the raw ns-typed child x. */
  private object NsConv {
    def unapply(e: Expression): Option[Expression] = e match {
      case c: Cast if isTsType(c.dataType) => unapply(c.child)
      case MicrosToTimestamp(d: IntegralDivide)
        if d.right.foldable && d.right.eval() == 1000L => Some(d.left)
      case _ => None
    }
    private def isTsType(dt: DataType): Boolean =
      dt == TimestampType || dt == TimestampNTZType
  }

  /** Timestamp literal → its µs-since-epoch value. Restricted to strictly
    * positive epochs: `div` truncates toward zero, so the ±999 boundary
    * algebra below is floor-division math that only holds for
    * non-negative ns values compared against post-1970 bounds (at the
    * 1970 boundary itself, negative sub-µs values would diverge). */
  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType) if v > 0 => Some(v)
      case Literal(v: Long, TimestampNTZType) if v > 0 => Some(v)
      case _ => None
    }
  }

  private def ns(us: Long, off: Long = 0L): Literal =
    Literal(us * 1000L + off, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!sessionIsUtc) plan else plan.transformAllExpressions {
    case GreaterThanOrEqual(NsConv(x), TsLit(m)) => GreaterThanOrEqual(x, ns(m))
    case GreaterThan(NsConv(x), TsLit(m))        => GreaterThan(x, ns(m, 999))
    case LessThanOrEqual(NsConv(x), TsLit(m))    => LessThanOrEqual(x, ns(m, 999))
    case LessThan(NsConv(x), TsLit(m))           => LessThan(x, ns(m))
    case EqualTo(NsConv(x), TsLit(m)) =>
      And(GreaterThanOrEqual(x, ns(m)), LessThanOrEqual(x, ns(m, 999)))
    // mirrored literal-first forms
    case GreaterThanOrEqual(TsLit(m), NsConv(x)) => LessThanOrEqual(x, ns(m, 999))
    case GreaterThan(TsLit(m), NsConv(x))        => LessThan(x, ns(m))
    case LessThanOrEqual(TsLit(m), NsConv(x))    => GreaterThanOrEqual(x, ns(m))
    case LessThan(TsLit(m), NsConv(x))           => GreaterThan(x, ns(m, 999))
    case EqualTo(TsLit(m), NsConv(x)) =>
      And(GreaterThanOrEqual(x, ns(m)), LessThanOrEqual(x, ns(m, 999)))
  }
}
