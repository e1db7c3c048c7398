package graft

/** Accuracy contract of the sketch aggregate (no SQL oracle — HLL
  * estimates are engine-specific): within 5% of exact on the testdata. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct lands within 5% of exact") {
    val rows = SparkEntry.queries("q_approx_distinct")(spark, sf0001)
      .select("approx_users", "exact_users").collect()
    rows.foreach { r =>
      val approx = r.getLong(0).toDouble
      val exact = r.getLong(1).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"approx=$approx exact=$exact")
    }
  }
}
