package graft

import graft.queries.Breadth103
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the hundred-fourth wave (Breadth103 IQR
  * fences / Cpk / Corwin–Schultz). */
class Wave106Spec extends SparkSpec {
  import spark.implicits._

  test("iqrOutliers: rank-exact quartiles, cross-multiplied fences") {
    // 1..8 plus outliers −100 and +100: n=10, k1=ceil(10/4)=3,
    // k3=ceil(30/4)=8. sorted: −100,1..8,100 → q1=2, q3=7 (cents 200,
    // 700). fences: 2x < 5·200−3·700=−1100 → x < −5.50 (−100 hits);
    // 2x > 5·700−3·200=2900 → x > 14.50 (100 hits).
    val e = ((1 to 8).map(_.toDouble) ++ Seq(-100.0, 100.0))
      .map(("g", _)).toDF("event_type", "value")
    val r = Breadth103.iqrOutliers(e, "event_type", "value").collect()(0)
    assert(r.getLong(1) === 10L)
    assert(r.getDouble(2) === 2.0 && r.getDouble(3) === 7.0)
    assert(r.getLong(4) === 1L && r.getLong(5) === 1L)
  }

  test("cpk from exact moments against the fixed spec band") {
    // values 1.00, 2.00, 3.00: μ=2, σ=1 → cpk = min(300−2, 2−0)/3 = 2/3
    val e = Seq(1.0, 2.0, 3.0).map(("g", _)).toDF("event_type", "value")
    val r = Breadth103.cpk(e, "event_type", "value").collect()(0)
    assert(r.getDouble(2) === 2.0 && r.getDouble(3) === 1.0)
    assert(r.getDouble(4) === 2.0 / 3.0)
  }

  test("csSpread: hand-built two-day alpha and spread") {
    // day1 H=2.00 L=1.00; day2 H=4.00 L=2.00 → lq1=lq2=ln2·1e6 floored
    val e = Seq(
      (1L, 0L, "2024-01-01 09:00:00", 1.00),
      (1L, 1L, "2024-01-01 17:00:00", 2.00),
      (1L, 2L, "2024-01-02 09:00:00", 2.00),
      (1L, 3L, "2024-01-02 17:00:00", 4.00))
      .toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth103.csSpread(e, "user_id", "ts", "value", "event_id")
      .collect()
    assert(got.length === 1)
    val lq = math.floor(math.log(2.0) * 1e6 + 0.5)
    val gq = math.floor(math.log(4.0) * 1e6 + 0.5)
    val beta = lq * lq + lq * lq
    val gamma = gq * gq
    val den = 3.0 - 2.0 * math.sqrt(2.0)
    val a = ((math.sqrt(2.0 * beta) - math.sqrt(beta)) / den -
      math.sqrt(gamma / den)) / 1e6
    val s = 2.0 * (math.exp(a) - 1.0) / (1.0 + math.exp(a))
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(got(0).getDouble(2) === r6(s))
  }
}
