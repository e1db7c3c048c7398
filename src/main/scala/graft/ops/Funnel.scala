package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-step funnel: per key, step k's time is the MIN event time of
  * step k's type STRICTLY AFTER the step-(k−1) time (the user must
  * actually traverse the funnel in order — a click that precedes every
  * view does not convert step 2). Each step is a full-partition window
  * min conditioned on the previous stage; all the Window nodes share the
  * key partitioning, so the whole cascade costs ONE shuffle regardless
  * of step count. (The per-step self-join formulation shuffles the full
  * log once per step.)
  */
object Funnel {

  /** Annotate `df` with `t1..tN` step times (null where the key never
    * reached the step). `steps` are values of `typeCol` in funnel order.
    *
    * The output names are part of the contract, so a caller frame that
    * ALREADY has a `t1..tN` column is rejected loudly: `withColumn`
    * would otherwise silently replace the caller's data, and — worse —
    * a pre-existing `t2` on a 3-step funnel would be read by step 3's
    * "strictly after t2" condition before step 2 computes it, yielding
    * step times that are wrong, not just renamed. */
  def stepTimes(df: DataFrame, keyCol: String, typeCol: String,
                tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val clash = steps.indices.map(i => s"t${i + 1}").filter(df.columns.contains)
    require(clash.isEmpty,
      s"funnel step-time columns ${clash.mkString(", ")} already exist on " +
        "the input — rename them first (stepTimes writes t1..tN)")
    val w = Window.partitionBy(col(keyCol))
    steps.zipWithIndex.foldLeft(df) { case (acc, (step, i)) =>
      val reached =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(tsCol) > col(s"t$i")
      acc.withColumn(s"t${i + 1}",
        min(when(reached, col(tsCol))).over(w))
    }
  }

  /** Distinct keys reaching each step (a 1-row conversion report). */
  def conversion(df: DataFrame, keyCol: String, typeCol: String,
                 tsCol: String, steps: Seq[String],
                 stepNames: Seq[String]): DataFrame = {
    require(steps.size == stepNames.size)
    val staged = stepTimes(df, keyCol, typeCol, tsCol, steps)
    val aggs = countDistinct(col(keyCol)).as("n_users") +:
      stepNames.zipWithIndex.map { case (n, i) =>
        countDistinct(when(col(s"t${i + 1}").isNotNull, col(keyCol))).as(n)
      }
    staged.agg(aggs.head, aggs.tail: _*)
  }
}
