package graft

import graft.queries.Breadth112
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-thirteenth wave (Breadth112 squeeze /
  * RS-ratio / VPT). */
class Wave117Spec extends SparkSpec {
  import spark.implicits._

  test("ttmSqueeze: integer cross-multiplied band verdict") {
    // two days, tight closes (1.00, 1.01) but wide intraday ranges →
    // BB σ small, KC TR wide → squeeze on at bar 2
    val e = Seq(
      (1L, 0L, "2024-01-01 09:00:00", 0.50), (1L, 1L, "2024-01-01 17:00:00", 1.00),
      (1L, 2L, "2024-01-02 09:00:00", 1.50), (1L, 3L, "2024-01-02 17:00:00", 1.01))
      .toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth112.ttmSqueeze(e, "user_id", "ts", "value",
      "event_id").collect()
    val r = got(1)
    // m=2, closes {100, 101}: varNum = 2·(100²+101²) − 201² = 1
    // TRs: 50 and max(49, |150−100|, |50−100|)=50 → st=100
    // 16·1·2 = 32 < 9·100²·1 = 90000 → on
    assert(r.getBoolean(5) === true)
    assert(r.getDouble(3) === 2.0 * math.sqrt(1.0 / 2.0) / 100.0)
    assert(r.getDouble(4) === 1.5 * 100.0 / 2.0 / 100.0)
    assert(got(0).getBoolean(5) === false) // m=1 never on
  }

  test("rsRatio: quantized RS over its trailing SMA") {
    // two keys, key 1 close 100, key 2 close 300 → mkt 400
    // RS_1 = 0.25 exactly; one bar → ratio 100
    val e = Seq((1L, 0L, 1.00), (2L, 1L, 3.00))
      .map { case (k, i, v) => (k, i, "2024-01-01 10:00:00", v) }
      .toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth112.rsRatio(e, "user_id", "ts", "value", "event_id")
      .collect()
    assert(got(0).getDouble(2) === 0.25 && got(0).getDouble(3) === 100.0)
    assert(got(1).getDouble(2) === 0.75)
  }

  test("vpt accumulates quantized proportional flows") {
    val e = Seq(
      (1L, 0L, "2024-01-01 10:00:00", 1.00, """{"k":10}"""),
      (1L, 1L, "2024-01-02 10:00:00", 1.50, """{"k":20}"""))
      .toDF("user_id", "event_id", "at", "value", "props")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth112.vpt(e, "user_id", "ts", "value", "event_id", "k")
      .collect()
    assert(got(0).getDouble(3) === 0.0)
    // day 2: 20·(150−100)/100 = 10.0
    assert(got(1).getDouble(3) === 10.0)
  }
}
