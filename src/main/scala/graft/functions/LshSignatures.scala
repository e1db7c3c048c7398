package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-hyperplane LSH signatures as ONE native expression: for each of
  * `numTables` tables, pack `numPlanes` projection sign bits into a long
  * bucket id. Output: array<long> of length numTables.
  *
  * Replaces a `(tables × planes × dim)`-term Column expression tree —
  * thousands of nodes that overflow whole-stage codegen's method budget
  * and fall back to interpreted projection — with a tight primitive loop.
  * Hyperplane weights are ±1 derived from a splitmix64-style mix of
  * (table, plane, dim): deterministic on every executor and every re-run,
  * no RNG state, no driver-side broadcast of plane matrices.
  */
case class LshSignatures(child: Expression, numPlanes: Int, numTables: Int)
    extends UnaryExpression {

  require(numPlanes > 0 && numPlanes <= 62 && numTables > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // nullable even for non-null child arrays: a null SLOT propagates null
  // (reading through it would fold an undefined value into every bucket)
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_signatures expects array<float|double>, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val sig = LshUtil.signatures(
      v.asInstanceOf[ArrayData], numPlanes, numTables, elemIsFloat)
    if (sig == null) null else new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val sig = ctx.freshName("sig")
      s"""
         |long[] $sig = graft.functions.LshUtil.signatures($x, $numPlanes, $numTables, $elemIsFloat);
         |if ($sig == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshUtil {

  /** ±1 weight for (table, plane, dim) via splitmix64 finalizer — pure
    * arithmetic, identical everywhere. */
  private def sign(t: Int, p: Int, i: Int): Double = {
    var z = (t.toLong << 42) ^ (p.toLong << 21) ^ i.toLong
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^= (z >>> 33)
    if ((z & 1L) == 1L) 1.0 else -1.0
  }

  // weights are a pure function of (planes, tables, dim); memoize the flat
  // [t][p][i] matrix per shape (one small array per executor JVM).
  @volatile private var cached: (Int, Int, Int, Array[Double]) = _

  private def weights(planes: Int, tables: Int, dim: Int): Array[Double] = {
    val c = cached
    if (c != null && c._1 == planes && c._2 == tables && c._3 == dim) return c._4
    val w = new Array[Double](tables * planes * dim)
    var t = 0
    while (t < tables) {
      var p = 0
      while (p < planes) {
        var i = 0
        while (i < dim) {
          w((t * planes + p) * dim + i) = sign(t, p, i)
          i += 1
        }
        p += 1
      }
      t += 1
    }
    cached = (planes, tables, dim, w)
    w
  }

  /** One bucket long per table for the given vector; null if any slot is
    * null (null propagation — an undefined read would skew every bucket). */
  def signatures(arr: ArrayData, planes: Int, tables: Int,
                 isFloat: Boolean): Array[Long] = {
    val dim = arr.numElements()
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val w = weights(planes, tables, dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        var proj = 0.0
        val base = (t * planes + p) * dim
        var j = 0
        while (j < dim) { proj += v(j) * w(base + j); j += 1 }
        if (proj > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }
}
