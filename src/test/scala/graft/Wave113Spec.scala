package graft

import graft.queries.Breadth108
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the hundred-ninth wave (Breadth108
  * Mann–Kendall / Poisson bootstrap / Cliff's δ). */
class Wave113Spec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String, Double)]) =
    rows.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("mannKendall: monotone series, no ties, continuity-corrected z") {
    val e = ev((1 to 3).map(i =>
      (1L, i.toLong, f"2024-01-0$i 10:00:00", i.toDouble)))
    val r = Breadth108.mannKendall(e, "user_id", "ts", "value",
      "event_id").collect()(0)
    assert(r.getLong(1) === 3L && r.getLong(2) === 3L)
    val v = (3.0 * 2.0 * 11.0 - 0.0) / 18.0
    assert(r.getDouble(3) === (3.0 - 1.0) / math.sqrt(v))
  }

  test("poissonBootstrap is deterministic with rank-exact CI bounds") {
    val e = ev((1 to 12).map(i =>
      (1L, i.toLong, f"2024-01-$i%02d 10:00:00", i.toDouble * (i % 3 + 1))))
    val r1 = Breadth108.poissonBootstrap(e, "user_id", "ts", "value",
      "event_id").collect()(0)
    val r2 = Breadth108.poissonBootstrap(e, "user_id", "ts", "value",
      "event_id").collect()(0)
    assert(r1 === r2)
    assert(r1.getLong(1) === 11L)       // 12 days → 11 moves
    assert(r1.getLong(2) === 32L)       // every replicate has weight
    assert(r1.getDouble(4) <= r1.getDouble(5))
  }

  test("cliffsDelta from the merged count table: (gt − lt)/(na·nb)") {
    val e = Seq(("click", 1.0), ("click", 2.0), ("purchase", 1.0),
      ("purchase", 3.0)).toDF("event_type", "value")
    val r = Breadth108.cliffsDelta(e, "event_type", "value", "click",
      "purchase").collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === -0.25)
  }
}
