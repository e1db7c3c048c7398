package graft

import graft.queries.Breadth55
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the fifty-sixth wave (Breadth55 portfolio
  * cross-sections). */
class Wave56Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Long, Int)]) =
    rows.zipWithIndex.map { case ((k, c, d), i) =>
      (k, c.toDouble / 100.0, i.toLong + 1, f"2024-01-$d%02d 10:00:00")
    }.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", lit("{}"))

  test("indexNav: equal-weight NAV and the cross-multiplied index " +
    "return by hand") {
    val got = Breadth55.indexNav(ticks(Seq(
        (1L, 100L, 1), (2L, 200L, 1), (1L, 110L, 2), (2L, 220L, 2))),
        "user_id", "ts", "value", "event_id")
      .orderBy("day")
      .collect().map(r => (r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got === Seq((2L, 1.5, None),
      (2L, 1.65, Some(330.0 * 2.0 / (300.0 * 2.0) - 1.0))))
  }

  test("turnover: a 50/50 book drifting to 2/3-1/3 turns over exactly " +
    "one sixth") {
    val got = Breadth55.turnover(ticks(Seq(
        (1L, 100L, 1), (2L, 100L, 1), (1L, 200L, 2), (2L, 100L, 2))),
        "user_id", "ts", "value", "event_id")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq((2L, 20000.0 / 120000.0)))
  }
}
