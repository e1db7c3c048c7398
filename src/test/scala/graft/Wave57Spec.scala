package graft

import graft.queries.Breadth56
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the fifty-seventh wave (Breadth56 volume
  * bars + VPIN). */
class Wave57Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Long, Long)]) = // (key, cents, vol)
    rows.zipWithIndex.map { case ((k, c, v), i) =>
      (k, c.toDouble / 100.0, i.toLong + 1,
        f"2024-01-01 ${10 + i / 60}%02d:${i % 60}%02d:00", v)
    }.toDF("user_id", "value", "event_id", "at", "k")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", concat(lit("{\"k\":"), col("k"), lit("}")))
      .drop("k")

  test("volumeBars: bar ids cut at the 500-unit boundary by the PRE-tick " +
    "cumulative; OHLC per bar is tick-order exact") {
    // vols 300, 150, 200, 400: cum-before = 0, 300, 450, 650
    // → bars 0,0,0,1 (the 200-unit tick STARTS at 450 < 500)
    val got = Breadth56.volumeBars(ticks(Seq(
        (1L, 100L, 300L), (1L, 120L, 150L), (1L, 90L, 200L),
        (1L, 110L, 400L))),
        "user_id", "ts", "value", "event_id", "k")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got === Seq(
      (0L, 3L, 650L, 100L, 90L, 120L, 90L),
      (1L, 1L, 400L, 110L, 110L, 110L, 110L)))
  }

  test("vpin: alternating equal up/down volume nets to zero imbalance; " +
    "one-sided flow scores 1 on post-first ticks") {
    // key 1: up 100, down 100 within one bar (first tick signs 0)
    //   signed: 0, +100, -100 → imb 0 → vpin 0
    val balanced = Breadth56.vpin(ticks(Seq(
        (1L, 100L, 100L), (1L, 110L, 100L), (1L, 100L, 100L))),
        "user_id", "ts", "value", "event_id", "k").collect().head
    assert(balanced.getLong(1) === 1L && balanced.getDouble(3) === 0.0)
    // key 2: strictly rising after the first tick → imb = vol - v1
    val oneSided = Breadth56.vpin(ticks(Seq(
        (2L, 100L, 100L), (2L, 110L, 100L), (2L, 120L, 100L))),
        "user_id", "ts", "value", "event_id", "k").collect().head
    assert(oneSided.getLong(2) === 300L)
    assert(oneSided.getDouble(3) === 200.0 / 300.0)
  }
}
