package graft

import graft.queries.Breadth52
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the fifty-third wave (Breadth52 three-bar
  * patterns + balance of power). */
class Wave52Spec extends SparkSpec {
  import spark.implicits._

  /** (key, cents, day) ticks; event order within a day = row order, so
    * the first/last listed cents are the day's open/close. */
  private def ticks(rows: Seq[(Long, Long, Int)]) =
    rows.zipWithIndex.map { case ((k, c, d), i) =>
      (k, c.toDouble / 100.0, i.toLong + 1, f"2024-01-$d%02d 10:00:00")
    }.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", lit("{}"))

  private def patterns(rows: Seq[(Long, Long, Int)]) =
    Breadth52.threeBarPatterns(ticks(rows),
        "user_id", "ts", "value", "event_id")
      .orderBy("day")
      .collect().map(r => (r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6))).toSeq

  test("three white soldiers fires on three rising up-bars opening " +
    "inside the prior body — and its mirror fires for crows") {
    val tws = patterns(Seq(
      (1L, 100L, 1), (1L, 110L, 1), // day1: o100 c110
      (1L, 105L, 2), (1L, 120L, 2), // day2: o105 c120
      (1L, 112L, 3), (1L, 130L, 3))) // day3: o112 c130
    assert(tws === Seq((false, false, false), (false, false, false),
      (true, false, false)))
    val crows = patterns(Seq(
      (1L, 130L, 1), (1L, 120L, 1),
      (1L, 125L, 2), (1L, 110L, 2),
      (1L, 118L, 3), (1L, 100L, 3)))
    assert(crows.last === ((false, true, false)))
  }

  test("morning star: long down bar, small star, up bar closing above " +
    "the first bar's midpoint") {
    val got = patterns(Seq(
      (1L, 200L, 1), (1L, 100L, 1), // long down, body 100
      (1L, 105L, 2), (1L, 110L, 2), // star, body 5 (5*3 <= 100)
      (1L, 108L, 3), (1L, 160L, 3))) // up close 160: 320 > 300
    assert(got.last === ((false, false, true)))
  }

  test("bop: (close-open)/(high-low) by hand; flat bar nulls; the 5-bar " +
    "form is the ratio of integer sums") {
    // 5 identical days: o100 h120 l90 c110 → bop 1/3; day5 bop_5 = 50/150
    val day = Seq(100L, 120L, 90L, 110L)
    val rows = (1 to 5).flatMap(d => day.map(c => (1L, c, d)))
    val got = Breadth52.bop(ticks(rows), "user_id", "ts", "value", "event_id")
      .orderBy("day")
      .collect().map(r => (
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got.map(_._1) === Seq.fill(5)(Some(10.0 / 30.0)))
    assert(got.map(_._2) === Seq(None, None, None, None,
      Some(50.0 / 150.0)))
    // flat bar → null daily bop
    val flat = Breadth52.bop(ticks(Seq((2L, 100L, 1), (2L, 100L, 1))),
      "user_id", "ts", "value", "event_id").collect().head
    assert(flat.isNullAt(2))
  }
}
