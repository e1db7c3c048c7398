package graft

import graft.queries.Breadth113
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-fourteenth wave (Breadth113 Rachev /
  * Martin / Sterling-lite). */
class Wave119Spec extends SparkSpec {
  import spark.implicits._

  private def ev(closes: Seq[Int]) =
    closes.zipWithIndex.map { case (c, i) =>
      (1L, i.toLong, f"2024-01-${i + 1}%02d 10:00:00", c.toDouble / 100.0)
    }.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("rachevRatio: decile tail means with tied-value overlap") {
    // 10 moves: −50, −10×8 values..., +40 → k=1: es_gain = top move,
    // es_loss = bottom move
    val moves = Seq(-50, -10, -5, -1, 1, 2, 3, 4, 5, 40)
    val closes = moves.scanLeft(10000)(_ + _)
    val r = Breadth113.rachevRatio(ev(closes), "user_id", "ts", "value",
      "event_id").collect()(0)
    assert(r.getLong(1) === 10L && r.getLong(2) === 1L)
    assert(r.getDouble(3) === 0.40 && r.getDouble(4) === -0.50)
    assert(r.getDouble(5) === 0.40 / 0.50)
  }

  test("martinRatio: quantized drawdowns from the running peak") {
    // closes 100, 50, 100: dd = 0, 0.5, 0 → ulcer = sqrt(0.25/3)
    val r = Breadth113.martinRatio(ev(Seq(100, 50, 100)), "user_id",
      "ts", "value", "event_id").collect()(0)
    val ulcer = math.sqrt((500000.0 * 500000.0) / 3.0) / 1e6
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(3) === ulcer)
    assert(r.getDouble(2) === 0.0) // moves −50, +50 → mean 0
    assert(r.getDouble(4) === 0.0 / ulcer)
  }

  test("sterlingLite: top-3 episode depths between new highs") {
    // peaks at 100; dips to 80 (dd .2), recover 110; dip 99 (dd .1)
    val closes = Seq(100, 80, 110, 99)
    val r = Breadth113.sterlingLite(ev(closes), "user_id", "ts", "value",
      "event_id").collect()(0)
    assert(r.getLong(1) === 2L)
    val d1 = math.floor(20.0 / 100.0 * 1e6 + 0.5)
    val d2 = math.floor(11.0 / 110.0 * 1e6 + 0.5)
    assert(r.getDouble(3) === (d1 + d2) / 2.0 / 1e6)
  }
}
