package graft

import graft.ops.TopK
import org.apache.spark.sql.functions._

/** Top-K+Other semantics lifted from the reference's doughnut prep
  * (frontend/src/App.js:97-142): <K keys → NO "Other" row; sum
  * preservation; percent-of-total sums to ~100. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def agg(n: Int) =
    (1 to n).map(i => (i.toString, i * 10.0)).toDF("bucket", "rev")

  test("fewer than k keys → no Other row") {
    val out = TopK.topKPlusOther(agg(5), "bucket", "rev", 7)
    assert(out.count() == 5)
    assert(!out.select("bucket").as[String].collect().contains("Other"))
  }

  test("exactly k keys → no Other row") {
    assert(TopK.topKPlusOther(agg(7), "bucket", "rev", 7).count() == 7)
  }

  test("k+m keys → k rows + Other preserving the grand total") {
    val out = TopK.topKPlusOther(agg(10), "bucket", "rev", 7)
    assert(out.count() == 8)
    val total = out.agg(sum("rev")).as[Double].head()
    assert(math.abs(total - (1 to 10).map(_ * 10.0).sum) < 1e-9)
    val other = out.filter($"bucket" === "Other").select("rev").as[Double].head()
    // top-7 by value desc = 10..4 → Other = 1+2+3 = 60
    assert(math.abs(other - 60.0) < 1e-9)
  }

  test("percent-of-total sums to 100 within rounding") {
    val out = TopK.withPercentOfTotal(agg(10), "rev")
    val s = out.agg(sum("pct")).as[Double].head()
    assert(math.abs(s - 100.0) < 0.1)
  }

  test("topNPerGroup keeps n rows per group in order") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("a", 2.0), ("b", 9.0))
      .toDF("g", "v")
    val out = TopK.topNPerGroup(df, Seq("g"), 2, col("v").desc)
      .select("g", "v").as[(String, Double)].collect().toSet
    assert(out == Set(("a", 3.0), ("a", 2.0), ("b", 9.0)))
  }
}
