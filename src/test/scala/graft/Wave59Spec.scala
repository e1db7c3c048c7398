package graft

import graft.queries.Breadth58
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the fifty-ninth wave (Breadth58 dollar bars
  * + bar-scheme comparison). */
class Wave59Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Long, Long)]) = // (key, cents, qty)
    rows.zipWithIndex.map { case ((k, c, v), i) =>
      (k, c.toDouble / 100.0, i.toLong + 1,
        f"2024-01-01 ${10 + i}%02d:00:00", v)
    }.toDF("user_id", "value", "event_id", "at", "k")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", concat(lit("{\"k\":"), col("k"), lit("}")))
      .drop("k")

  // dv: 1.5e6, 0.4e6, 0.15e6 (cum-before 1.9e6 → still bar 0),
  // then 1.25e6 starting at exactly 2.05e6 → bar 1
  private val rows = Seq((1L, 100L, 15000L), (1L, 200L, 2000L),
    (1L, 150L, 1000L), (1L, 250L, 5000L))

  test("dollarBars: bar ids advance on traded VALUE with OHLC per bar") {
    val got = Breadth58.dollarBars(ticks(rows),
        "user_id", "ts", "value", "event_id", "k")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got === Seq(
      (0L, 3L, 2050000L, 100L, 150L, 200L, 100L),
      (1L, 1L, 1250000L, 250L, 250L, 250L, 250L)))
  }

  test("barCompare: the three schemes cut the same ticks differently — " +
    "hand counts and mean moves") {
    val got = Breadth58.barCompare(ticks(rows),
        "user_id", "ts", "value", "event_id", "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // volume (BarVol 500): cum-before 0,15000,17000,18000 → 4 one-tick
    // bars, zero move; time: one day bar 100→250; dollar: 50 + 0
    assert(got === Seq(
      ("dollar", 2L, 50L, 50.0 / 200.0),
      ("time", 1L, 150L, 150.0 / 100.0),
      ("volume", 4L, 0L, 0.0)))
  }
}
