package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2D Pareto frontier (skyline), both dimensions minimized. The
  * frontier is computed on the per-x aggregate (min y + row count), so
  * the corpus-sized work is one groupBy shuffle; the cumulative-min
  * window then runs over at most |distinct x| rows — the
  * single-partition window is a deliberate choice on that reduced set,
  * never on raw data. The all-pairs dominance self-join (O(n²)) never
  * happens.
  */
object Skyline {

  /** Rows (x, best_y = min y at that x, n rows at that x) for every x
    * on the frontier: no strictly smaller x achieved an equal-or-lower
    * y. Column names for the two derived outputs are caller-chosen so
    * the frontier drops into any schema. */
  def frontier2d(df: DataFrame, xCol: String, yCol: String,
                 bestCol: String, nCol: String): DataFrame = {
    val g = df.groupBy(col(xCol))
      .agg(min(col(yCol)).as(bestCol), count(lit(1)).as(nCol))
    val prev = Window.orderBy(col(xCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("prev_best", min(col(bestCol)).over(prev))
      .filter(col("prev_best").isNull || col(bestCol) < col("prev_best"))
      .select(col(xCol), col(bestCol), col(nCol))
  }
}
