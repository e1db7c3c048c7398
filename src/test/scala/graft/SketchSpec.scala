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

  test("raw approx_count_distinct at rsd 0.01 lands within 5% (5 sigma) " +
    "of exact per group, at every local SF") {
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val rows = Tables.events(spark, sf)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx"),
          countDistinct(col("user_id")).as("exact"))
        .select("approx", "exact").collect()
      rows.foreach { r =>
        val approx = r.getLong(0).toDouble
        val exact = r.getLong(1).toDouble
        assert(math.abs(approx - exact) / exact <= 0.05,
          s"$sf: approx=$approx exact=$exact")
      }
    }
  }

  test("quantile-sketch rank band holds at adversarially small n " +
    "(discreteness: n=11 forces le50 >= 6 > 11*0.51 without additive slack)") {
    import spark.implicits._
    // distinct values, no duplicate mass — a CORRECT sketch on n=11
    // returns the 6th value, so le50 = 6; the band must admit it.
    // Groups at n=1..3 cover the degenerate corners.
    val rows =
      (1 to 11).map(i => ("g11", i.toDouble)) ++
        Seq(("g1", 1.0)) ++ (1 to 2).map(i => ("g2", i.toDouble)) ++
        (1 to 3).map(i => ("g3", i.toDouble))
    val out = graft.queries.Extensions5
      .quantileSketchReport(rows.toDF("event_type", "value"))
      .collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getAs[Boolean]("p50_ok"), s"p50 band failed at n=${r.getAs[Long]("n")}")
      assert(r.getAs[Boolean]("p90_ok"), s"p90 band failed at n=${r.getAs[Long]("n")}")
    }
    // the band is still a band: a group whose 'sketch' answer is wildly
    // off would fail — pinned indirectly by the large-n driver oracle,
    // and directly here via the le-count arithmetic at n=1000
    val big = (1 to 1000).map(i => ("gbig", i.toDouble))
    val r = graft.queries.Extensions5
      .quantileSketchReport(big.toDF("event_type", "value")).collect().head
    assert(r.getAs[Boolean]("p50_ok") && r.getAs[Boolean]("p90_ok"))
  }

  test("q_heavy_hitters token counts are memoized: repeat builds reuse " +
    "ONE cached frame instead of leaking a persist per invocation") {
    val a = graft.queries.Extensions4.tokenCounts(spark, sf0001)
    val b = graft.queries.Extensions4.tokenCounts(spark, sf0001)
    assert(a eq b, "tokenCounts must return the memoized frame")
    // and the query builder itself goes through the memo: building the
    // query twice adds no second cached plan for the counts frame
    val q1 = SparkEntry.queries("q_heavy_hitters")(spark, sf0001)
    val q2 = SparkEntry.queries("q_heavy_hitters")(spark, sf0001)
    assert(q1.collect().toSeq == q2.collect().toSeq)
    assert(graft.queries.Extensions4.tokenCounts(spark, sf0001) eq a,
      "query build must not displace or duplicate the memo entry")
  }
}
