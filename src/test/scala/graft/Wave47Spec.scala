package graft

import graft.queries.Breadth47
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the forty-eighth wave (Breadth47 risk
  * validation). */
class Wave47Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(closes: Seq[Long]) =
    closes.zipWithIndex.map { case (c, i) =>
      (1L, c.toDouble / 100.0, i.toLong + 1, f"2024-01-${i + 1}%02d 10:00:00")
    }.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", lit("{}"))

  test("varBacktest: 10 moves split 6/4 — VaR is the 2nd-smallest " +
    "train move, both deeper test losses count as exceptions") {
    val moves = Seq(-50L, -40L, 10L, 20L, 30L, 40L, -60L, 5L, -45L, 10L)
    val closes = moves.scanLeft(1000L)(_ + _)
    val got = Breadth47.varBacktest(ticks(closes),
        "user_id", "ts", "value", "event_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    val lr = -2.0 * (2.0 * math.log(1.0 - 1.0 / 5.0)
      + 2.0 * math.log(1.0 / 5.0)
      - 2.0 * math.log(1.0 - 0.5) - 2.0 * math.log(0.5))
    val lr6 = BigDecimal(lr).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(got === Seq((6L, 4L, 0.40, 2L, 0.5, lr6)))
  }

  test("varBacktest: a test window with no exceptions leaves the " +
    "Kupiec LR null rather than taking ln(0)") {
    // train has the only losses; test is all gains
    val moves = Seq(-50L, -40L, 10L, 20L, 30L, 40L, 5L, 15L, 25L, 35L)
    val closes = moves.scanLeft(1000L)(_ + _)
    val r = Breadth47.varBacktest(ticks(closes),
      "user_id", "ts", "value", "event_id").collect().head
    assert(r.getLong(4) === 0L)
    assert(r.isNullAt(6))
  }

  test("volCone: a constant-magnitude move series collapses the cone " +
    "to a single vol at every horizon, with the right window counts") {
    // 13 closes alternating ±10 cents → 12 diffs of |10|
    val closes = (0 to 12).map(i => if (i % 2 == 0) 1000L else 1010L)
    val got = Breadth47.volCone(ticks(closes),
        "user_id", "ts", "value", "event_id")
      .orderBy("horizon")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
      .toSeq
    assert(got === Seq(
      (3, 10L, 0.1, 0.1, 0.1, 0.1, 0.1),
      (5, 8L, 0.1, 0.1, 0.1, 0.1, 0.1),
      (10, 3L, 0.1, 0.1, 0.1, 0.1, 0.1)))
  }
}
