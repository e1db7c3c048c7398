package graft

import graft.queries.Breadth99
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the hundredth wave (Breadth99 forecasting
  * recurrences). */
class Wave102Spec extends SparkSpec {
  import spark.implicits._

  test("holtWinters: seed then one additive step with weekday season") {
    // Mondays 2024-01-01 and 2024-01-08 (dw=1), closes 1.00 then 2.00
    val e = Seq((1L, 0L, "2024-01-01 10:00:00", 1.00),
      (1L, 1L, "2024-01-08 10:00:00", 2.00))
      .toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth99.holtWinters(e, "user_id", "ts", "value",
      "event_id").collect()
    // seed: l=100, t=0, s=0, fitted null
    assert(got(0).getDouble(2) === 1.0 && got(0).getDouble(3) === 0.0)
    assert(got(0).getDouble(4) === 0.0 && got(0).isNullAt(5))
    // step: fit = 100+0+0 = 100; lN = .2(200−0)+.8(100) = 120;
    // tN = .1(120−100)+.9·0 = 2; sN = .25(200−120)+.75·0 = 20
    assert(got(1).getDouble(2) === 1.2)
    assert(got(1).getDouble(3) === 0.02)
    assert(got(1).getDouble(4) === 0.2)
    assert(got(1).getDouble(5) === 1.0)
  }

  test("croston: paired SES of size and gap on demand days only") {
    val e = Seq(
      (1L, 0L, "2024-01-01 10:00:00", """{"k":10}"""),
      (1L, 1L, "2024-01-02 10:00:00", """{}"""),      // no demand
      (1L, 2L, "2024-01-05 10:00:00", """{"k":20}""")) // gap 4
      .toDF("user_id", "event_id", "at", "props")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth99.croston(e, "user_id", "ts", "k").collect()
    assert(got.length === 2)
    // seed z=10, p=1, fc=10
    assert(got(0).getLong(2) === 10L && got(0).getDouble(3) === 10.0 &&
      got(0).getDouble(4) === 1.0 && got(0).getDouble(5) === 10.0)
    // step: z = .1·20+.9·10 = 11; p = .1·4+.9·1 = 1.3; fc = 11/1.3
    assert(got(1).getDouble(3) === 11.0)
    assert(got(1).getDouble(4) === 0.1 * 4.0 + 0.9 * 1.0)
    assert(got(1).getDouble(5) === 11.0 / (0.1 * 4.0 + 0.9 * 1.0))
  }

  test("theta: OLS fit line, theta-2 residual doubling, SES") {
    // closes 1.00, 2.00, 3.00 on consecutive days: perfect fit,
    // slope = 100 c/bar, a = 0, theta line = 2y − fit = y
    val e = (1 to 3).map(i => (1L, i.toLong, f"2024-01-0$i 10:00:00",
      i.toDouble)).toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth99.theta(e, "user_id", "ts", "value", "event_id")
      .collect()
    assert(got.map(_.getDouble(2)).toSeq === Seq(1.0, 2.0, 3.0))
    // SES(0.2): e1=100, e2=.2·200+.8·100=120, e3=.2·300+.8·120=156
    assert(got.map(_.getDouble(3)).toSeq === Seq(1.0, 1.2, 1.56))
    assert(got.map(_.getDouble(4)).toSeq === Seq(1.0, 1.0, 1.0))
  }
}
