package graft

import graft.queries.Breadth26
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the twenty-sixth wave (Breadth26 SQL-surface
  * aggregate completions). */
class Wave26Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long, String, String)]) =
    rows.toDF("user_id", "value", "event_id", "event_type", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", lit("{}"))

  private def at(i: Int) = f"2024-01-${(i % 27) + 1}%02d 10:00:00"

  test("modeBy: picks the most frequent cent value, and a count tie goes " +
    "to the smallest value") {
    val rows = Seq(10.0, 10.0, 12.0, 12.0, 11.0).zipWithIndex.map {
      case (v, i) => (1L, v, i.toLong, "buy", at(i))
    } ++ Seq(20.0, 21.0, 21.0).zipWithIndex.map {
      case (v, i) => (1L, v, 100L + i, "sell", at(i))
    }
    val got = Breadth26.modeBy(ticks(rows), "event_type", "value")
      .orderBy("event_type")
      .as[(String, Long, Long)].collect().toSeq
    // buy: 1000 and 1200 both count 2 -> tie to 1000 ; sell: 2100 wins
    assert(got === Seq(("buy", 1000L, 2L), ("sell", 2100L, 2L)))
  }

  test("stringAgg: distinct sorted CSV per key, duplicates collapsed") {
    val rows = Seq((1L, 1.0, 1L, "sell", at(0)), (1L, 1.0, 2L, "buy", at(1)),
      (1L, 1.0, 3L, "sell", at(2)), (2L, 1.0, 4L, "hold", at(3)))
    val got = Breadth26.stringAgg(ticks(rows), "user_id", "event_type")
      .orderBy("user_id")
      .as[(Long, Int, String)].collect().toSeq
    assert(got === Seq((1L, 2, "buy,sell"), (2L, 1, "hold")))
  }

  test("bitwiseAgg: hand-computed AND/OR/XOR over known bit patterns") {
    // cents: 12 = 0b1100, 10 = 0b1010, 6 = 0b0110
    val rows = Seq((1L, 0.12, 1L, "x", at(0)), (1L, 0.10, 2L, "x", at(1)),
      (1L, 0.06, 3L, "x", at(2)))
    val got = Breadth26.bitwiseAgg(ticks(rows), "event_type", "value")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("x", 3L, 12L & 10L & 6L, 12L | 10L | 6L,
      12L ^ 10L ^ 6L)))
  }

  test("olsTrend: a perfect line pins slope/intercept/r2 exactly, a flat " +
    "series scores slope 0 with r2 unscored, and calendar gaps index by " +
    "real day distance") {
    // key 1: closes 1000 + 50*t on days 1..4 -> slope 50, icept 1000, r2 1
    val line = (0 until 4).map(i =>
      (1L, (1000L + 50L * i).toDouble / 100.0, i.toLong, "t",
        f"2024-01-${i + 1}%02d 10:00:00"))
    // key 2: flat 900 -> denx > 0, deny = 0
    val flat = (0 until 3).map(i =>
      (2L, 9.0, 100L + i, "t", f"2024-01-${i + 1}%02d 10:00:00"))
    // key 3: days 1, 2, 4 (gap): closes 1000, 1100, 1300 = 1000 + 100*t
    // with t = 0, 1, 3 -> the gap must NOT compress to index 2
    val gap = Seq((3L, 10.0, 200L, "t", "2024-01-01 10:00:00"),
      (3L, 11.0, 201L, "t", "2024-01-02 10:00:00"),
      (3L, 13.0, 202L, "t", "2024-01-04 10:00:00"))
    val got = Breadth26.olsTrend(ticks(line ++ flat ++ gap), "user_id",
      "ts", "value", "event_id")
      .orderBy("user_id")
      .select("user_id", "n_days", "slope_cents_per_day", "intercept_cents",
        "r2")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(got(0) === ((1L, 4L, Some(50.0), Some(1000.0), Some(1.0))))
    assert(got(1) === ((2L, 3L, Some(0.0), Some(900.0), None)))
    assert(got(2) === ((3L, 3L, Some(100.0), Some(1000.0), Some(1.0))))
  }
}
