package graft

import graft.queries.Breadth79
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the eightieth wave (Breadth79 rolling
  * correlation / event drift / intraday activity). */
class Wave82Spec extends SparkSpec {
  import spark.implicits._

  private def eventsOfCloses(user: Long, closes: Seq[Double]) =
    closes.zipWithIndex.map { case (v, i) =>
      (user, user * 100 + i, f"2024-01-${i + 1}%02d 10:00:00", v)
    }.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("rollingCorr: a single-key market pins full-window rows at the " +
    "hand Pearson, warm-up rows null") {
    // single key -> market == own move; w=3 on moves 1,2,9,-3
    val e = eventsOfCloses(1L, Seq(1.00, 1.01, 1.03, 1.12, 1.09))
    val got = Breadth79.rollingCorr(e, "user_id", "ts", "value",
        "event_id", w = 3)
      .collect().map(r =>
        if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
    def self3(xs: Seq[Long]): Double = {
      val n = 3L; val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      val v = n * sxx - sx * sx
      (n * sxx - sx * sx).toDouble /
        (math.sqrt(v.toDouble) * math.sqrt(v.toDouble))
    }
    assert(got(0) === None && got(1) === None)
    assert(got(2) === Some(self3(Seq(1L, 2L, 9L))))
    assert(got(3) === Some(self3(Seq(2L, 9L, -3L))))
  }

  test("eventDrift: one qualifying shock with a full 3-day tail gives " +
    "the exact cumulative drift") {
    // moves: 1,-2,3,100,5,-7,2 -> |x| median (rank 4 of 7) = 3;
    // shock: 100 (>12); tail 5-7+2 = 0... use different tail: 5,-7,4
    val moves = Seq(1, -2, 3, 100, 5, -7, 4)
    val closes = moves.scanLeft(1000)(_ + _).map(_ / 100.0)
    val e = eventsOfCloses(1L, closes)
    val r = Breadth79.eventDrift(e, "user_id", "ts", "value", "event_id")
      .collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 1L)
    assert(r(0).getLong(2) === 2L) // 5 - 7 + 4
    assert(r(0).getDouble(3) === 2.0)
  }

  test("intradayActivity: tick moves bucket by hour and never cross " +
    "a day boundary") {
    val rows = Seq(
      (1L, 1L, "2024-01-01 09:10:00", 1.00),
      (1L, 2L, "2024-01-01 09:40:00", 1.05), // +5 @ 9
      (1L, 3L, "2024-01-01 15:00:00", 1.02), // -3 @ 15
      (1L, 4L, "2024-01-02 09:30:00", 2.00), // first tick of day: no move
      (1L, 5L, "2024-01-02 09:45:00", 2.07)) // +7 @ 9
      .toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth79.intradayActivity(rows, "user_id", "ts", "value",
        "event_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === Seq((9, 2L, 12L, 6.0), (15, 1L, 3L, 3.0)))
  }
}
