package graft

import graft.functions.{CosineSimilarity, LshSignatures, WordShingles, ZValue}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session extension registering graft's native expressions as SQL
  * functions, so `spark.sql("... graft_cosine(a, b) ...")` works next to
  * the Column API. Install via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  // throws like intArg — a column or misspelled literal must error, not
  // silently fall back to distinct=false
  private def boolArg(e: Expression, name: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be a boolean literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.NanosPushdown)
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (args: Seq[Expression]) => WordShingles(args(0),
        intArg(args(1), "n"), args.length > 2 && boolArg(args(2), "distinct"))))
    ext.injectFunction((
      FunctionIdentifier("graft_zvalue"),
      new ExpressionInfo(classOf[ZValue].getName, "graft_zvalue"),
      (args: Seq[Expression]) => ZValue(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_signatures"),
      new ExpressionInfo(classOf[LshSignatures].getName, "graft_lsh_signatures"),
      (args: Seq[Expression]) => LshSignatures(args(0),
        intArg(args(1), "numPlanes"), intArg(args(2), "numTables"))))
  }
}
