package graft

import graft.Tables
import org.apache.spark.sql.functions._

/** Accuracy contract of the sketch aggregate. The query now carries the
  * bound as a column (approx_ok) so the DuckDB oracle can assert it
  * (literal true per group); this spec pins the raw estimates too. */
class SketchSpec extends SparkSpec {

  test("q_approx_distinct reports every group within the 5% bound") {
    val rows = SparkEntry.queries("q_approx_distinct")(spark, sf0001)
      .select("approx_ok").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(0)), "estimate outside ±5% of exact")
  }

  test("raw approx_count_distinct lands within 5% of exact per group") {
    val rows = Tables.events(spark, sf0001)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .select("approx", "exact").collect()
    rows.foreach { r =>
      val approx = r.getLong(0).toDouble
      val exact = r.getLong(1).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"approx=$approx exact=$exact")
    }
  }
}
