package graft

import graft.queries.Breadth78
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the seventy-ninth wave (Breadth78 month
  * effect / drawdown episodes / POT exceedances). */
class Wave81Spec extends SparkSpec {
  import spark.implicits._

  private def eventsOn(user: Long, dayVals: Seq[(String, Double)]) =
    dayVals.zipWithIndex.map { case ((d, v), i) =>
      (user, user * 100 + i, s"$d 10:00:00", v)
    }.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("monthEffect: moves land in their calendar month") {
    // closes spanning Jan->Feb: moves on 01-31 (+2), 02-01 (-3),
    // 02-02 (+6)
    val e = eventsOn(1L, Seq(("2024-01-30", 1.00), ("2024-01-31", 1.02),
      ("2024-02-01", 0.99), ("2024-02-02", 1.05)))
    val got = Breadth78.monthEffect(e, "user_id", "ts", "value",
        "event_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got === Seq(
      (1, 1L, 2L, 2.0, 1.0),
      (2, 2L, 3L, 1.5, 0.5)))
  }

  test("ddEpisodes: two distinct under-peak runs count as two " +
    "episodes with the exact mean length") {
    // closes 100,90,95,100,110,105,103,110: under-peak days:
    // 90,95 (run 1), then 105,103 (run 2) -> 4 days under, 2 episodes
    val closes = Seq(1.00, 0.90, 0.95, 1.00, 1.10, 1.05, 1.03, 1.10)
    val e = eventsOn(1L, closes.zipWithIndex.map { case (v, i) =>
      (f"2024-01-${i + 1}%02d", v)
    })
    val r = Breadth78.ddEpisodes(e, "user_id", "ts", "value", "event_id")
      .collect()(0)
    assert(r.getLong(1) === 8L)
    assert(r.getLong(2) === 4L)
    assert(r.getLong(3) === 2L)
    assert(r.getDouble(4) === 2.0)
  }

  test("potExceed: the exact lower-median |move| gates strict " +
    "cross-multiplied exceedances") {
    // |moves|: 1,2,3,10,50 -> lower median (rank 3) = 3;
    // >6: 10,50 -> 2; >12: 50 -> 1
    val moves = Seq(1, -2, 3, 10, -50)
    val closes = moves.scanLeft(1000)(_ + _).map(_ / 100.0)
    val e = eventsOn(1L, closes.zipWithIndex.map { case (v, i) =>
      (f"2024-01-${i + 1}%02d", v)
    })
    val r = Breadth78.potExceed(e, "user_id", "ts", "value", "event_id")
      .collect()(0)
    assert(r.getLong(1) === 5L)
    assert(r.getLong(2) === 3L)
    assert(r.getLong(3) === 2L)
    assert(r.getLong(4) === 1L)
    assert(r.getDouble(5) === 2.0 / 5.0)
  }
}
