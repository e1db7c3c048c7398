package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of an ALREADY-NORMALIZED text (single-space
  * separated, as produced by graft.text.Text.norm) as one native
  * expression: a single scan over the string collecting space positions,
  * then substring slices — replacing a transform(sequence)+slice+
  * concat_ws chain that allocates a token array plus one list and string
  * per position per row.
  *
  * Semantics (shared with the SQL oracle, which states the same thing
  * over regexp_split_to_array + list_slice): windows of n consecutive
  * tokens joined by single spaces; docs with fewer than n tokens yield
  * one whole-doc shingle; `distinct` keeps first occurrences only.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles expects string, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    ShingleUtil.shingles(v.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.ShingleUtil.shingles($x, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleUtil {
  /** Single-pass shingling over the UTF-8 bytes. Token boundaries are the
    * 0x20 bytes (the normalizer collapsed all whitespace to single ASCII
    * spaces, so byte-level scanning is exact for any UTF-8 content). */
  def shingles(s: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    val str = s.toString
    val len = str.length
    // space positions delimit tokens; starts(i) = char index of token i
    val starts = new scala.collection.mutable.ArrayBuffer[Int](32)
    starts += 0
    var i = 0
    while (i < len) {
      if (str.charAt(i) == ' ') starts += i + 1
      i += 1
    }
    val nTok = starts.length
    val out =
      if (nTok < n) {
        Array[Any](UTF8String.fromString(str))
      } else {
        val m = nTok - n + 1
        val arr = new Array[Any](m)
        var k = 0
        while (k < m) {
          val from = starts(k)
          val to = if (k + n < nTok) starts(k + n) - 1 else len
          arr(k) = UTF8String.fromString(str.substring(from, to))
          k += 1
        }
        arr.asInstanceOf[Array[Any]]
      }
    val res =
      if (!distinct) out
      else {
        val seen = new java.util.LinkedHashSet[Any]()
        out.foreach(seen.add)
        seen.toArray.asInstanceOf[Array[Any]]
      }
    new GenericArrayData(res)
  }
}
