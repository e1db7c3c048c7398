package graft

import graft.queries.Breadth39
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the thirty-ninth wave (Breadth39 market
  * breadth). */
class Wave39Spec extends SparkSpec {
  import spark.implicits._

  private def day(i: Int) =
    java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1).toString + " 10:00:00"

  private def ticks(rows: Seq[(Long, Long, Int)]) = // (key, cents, dayIdx)
    rows.zipWithIndex.map { case ((k, c, d), i) =>
      (k, c.toDouble / 100.0, i.toLong + 1, day(d))
    }.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", lit("{}"))

  test("adLine: known per-key moves pin the daily counts, the " +
    "cumulative line and the hand-folded McClellan") {
    // 3 keys, 4 days: day2 two up one down (+1); day3 all down (−3);
    // day4 two up one flat (+2)
    val rows = Seq(
      (1L, 1000L, 1), (2L, 2000L, 1), (3L, 3000L, 1),
      (1L, 1010L, 2), (2L, 2010L, 2), (3L, 2990L, 2),
      (1L, 1000L, 3), (2L, 2000L, 3), (3L, 2980L, 3),
      (1L, 1010L, 4), (2L, 2010L, 4), (3L, 2980L, 4))
    val got = Breadth39.adLine(ticks(rows),
      "user_id", "ts", "value", "event_id")
      .orderBy("day")
      .select("n_adv", "n_dec", "net", "ad_line", "mcclellan")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4)) ===
      Seq((2L, 1L, 1L, 1L), (0L, 3L, -3L, -2L), (2L, 0L, 2L, 0L)))
    var st: Option[(Double, Double)] = None
    val want = Seq(1L, -3L, 2L).map { n =>
      val s = Breadth39.mcStep(st, n)
      st = Some(s)
      s._1 - s._2
    }
    assert(got.map(_._5) === want)
    assert(got.head._5 === 0.0) // both EMAs seed at the first net
  }

  test("newExtremes: a marching series makes every scored close a new " +
    "high and none a new low once past the flat seed window") {
    val rows = (0 until 25).flatMap(i => Seq(
      (1L, 1000L + i * 10, i + 1), (2L, 5000L - i * 10, i + 1)))
    val got = Breadth39.newExtremes(ticks(rows),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("n_scored", "n_new_highs", "n_new_lows")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.size === 25 - 19)
    // key1 rises (always at its 20-bar max), key2 falls (always at min)
    assert(got.forall(_ === ((2L, 1L, 1L))))
  }
}
