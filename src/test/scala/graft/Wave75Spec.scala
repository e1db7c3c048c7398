package graft

import graft.queries.Breadth73
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the seventy-fourth wave (Breadth73 Kelly /
  * capture ratio / pain index). */
class Wave75Spec extends SparkSpec {
  import spark.implicits._

  private def eventsOfCloses(user: Long, closes: Seq[Double]) =
    closes.zipWithIndex.map { case (v, i) =>
      (user, user * 100 + i, f"2024-01-${i + 1}%02d 10:00:00", v)
    }.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("kelly: hand integer ratios; a win-only key has no win/loss " +
    "fraction") {
    // moves: +2, -1, +3, 0
    val e = eventsOfCloses(1L, Seq(1.00, 1.02, 1.01, 1.04, 1.04))
      .unionAll(eventsOfCloses(2L, Seq(2.00, 2.01, 2.03))) // +1, +2
    val got = Breadth73.kelly(e, "user_id", "ts", "value", "event_id")
      .collect()
    val k1 = got.find(_.getLong(0) == 1L).get
    assert(k1.getLong(1) === 4L)
    assert(k1.getDouble(2) === 16.0 / 40.0)  // n·Σx / (nΣx² − (Σx)²)
    assert(k1.getDouble(3) === 8.0 / 15.0)   // nw(sw−sl) / (n2·sw)
    val k2 = got.find(_.getLong(0) == 2L).get
    assert(k2.getDouble(2) === (2.0 * 3.0) / (2.0 * 5.0 - 9.0))
    assert(k2.isNullAt(3)) // no losses -> win/loss Kelly undefined
  }

  test("captureRatio: aggregate up/down capture on a 2-key market") {
    // A: +2,-3,+4; B: +1,-1,+1 -> market 3,-4,5
    val e = eventsOfCloses(1L, Seq(1.00, 1.02, 0.99, 1.03))
      .unionAll(eventsOfCloses(2L, Seq(2.00, 2.01, 2.00, 2.01)))
    val got = Breadth73.captureRatio(e, "user_id", "ts", "value",
        "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got === Seq(
      (1L, 2L, 1L, 6.0 / 8.0, -3.0 / -4.0, (6.0 / 8.0) / (-3.0 / -4.0)),
      (2L, 2L, 1L, 2.0 / 8.0, -1.0 / -4.0, (2.0 / 8.0) / (-1.0 / -4.0))))
  }

  test("painIndex: mean and max distance below the running peak") {
    // closes 100,110,105,120,90 -> dd 0,0,5,0,30
    val e = eventsOfCloses(1L, Seq(1.00, 1.10, 1.05, 1.20, 0.90))
    val r = Breadth73.painIndex(e, "user_id", "ts", "value", "event_id")
      .collect()(0)
    assert(r.getLong(1) === 5L)
    assert(r.getLong(2) === 30L)
    assert(r.getDouble(3) === 35.0 / 5.0)
  }
}
