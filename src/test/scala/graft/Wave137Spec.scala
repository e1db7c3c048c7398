package graft

import graft.queries.Breadth129
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-thirtieth wave (Breadth129 forecast-
  * baseline eval + hour×weekday grid). */
class Wave137Spec extends SparkSpec {
  import spark.implicits._

  test("forecastEval: a 7-periodic series makes seasonal-naive exact " +
    "while naive pays the full step") {
    // closes cycle 100,200,...,700 twice + one bar: at every t ≥ 8,
    // c_t = c_{t−7} exactly → es = 0; naive error = |step|
    val cyc = Seq(100L, 200L, 300L, 400L, 500L, 600L, 700L)
    val closes = cyc ++ cyc ++ cyc.take(1)
    val e = closes.zipWithIndex.map { case (c, i) =>
      (1L, i.toLong, f"2024-01-${i + 1}%02d 10:00:00", c.toDouble / 100.0)
    }.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val r = Breadth129.forecastEval(e, "user_id", "ts", "value",
      "event_id").collect()(0)
    assert(r.getLong(1) === 8L)            // bars 8..15 evaluated
    assert(r.getDouble(3) === 0.0)         // mae_snaive exact
    assert(r.getDouble(5) === 0.0)         // mase_snaive
    assert(r.getDouble(2) > 0.0)           // naive pays the steps
  }

  test("forecastEval drift: truncate-toward-zero forecast hand-check") {
    // monotone +10 steps: at t, l1 = c1 + 10(t−2), drift slope =
    // 10(t−2)//(t−2) = 10 → forecast exact → mae_drift 0
    val closes = (0 until 12).map(i => 1000L + 10L * i)
    val e = closes.zipWithIndex.map { case (c, i) =>
      (1L, i.toLong, f"2024-01-${i + 1}%02d 10:00:00", c.toDouble / 100.0)
    }.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val r = Breadth129.forecastEval(e, "user_id", "ts", "value",
      "event_id").collect()(0)
    assert(r.getDouble(4) === 0.0)         // mae_drift
    assert(r.getDouble(6) === 0.0)         // mase_drift
  }

  test("hourDowGrid: ISO weekday cells with exact shares") {
    // 2024-01-01 is a Monday (dow 0); 2024-01-07 a Sunday (dow 6)
    val e = Seq(
      ("2024-01-01 09:00:00"), ("2024-01-01 09:30:00"),
      ("2024-01-07 23:00:00"))
      .toDF("at").withColumn("ts", to_timestamp_ntz(col("at")))
    val got = Breadth129.hourDowGrid(e, "ts").collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got((0, 9)) === ((2L, 2.0 / 3.0)))
    assert(got((6, 23)) === ((1L, 1.0 / 3.0)))
    assert(got.size === 2)
  }
}
