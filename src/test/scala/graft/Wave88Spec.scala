package graft

import graft.queries.Breadth85
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the eighty-sixth wave (Breadth85 variance
  * ratio / Cornish-Fisher VaR / drawdown-at-risk). */
class Wave88Spec extends SparkSpec {
  import spark.implicits._

  private def eventsOfCloses(user: Long, closes: Seq[Double]) =
    closes.zipWithIndex.map { case (v, i) =>
      (user, user * 100 + i, f"2024-01-${i + 1}%02d 10:00:00", v)
    }.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("varianceRatio: a linear trend scores the hand VR(5) from exact " +
    "integer sums") {
    // moves 1..6; overlapping 5-sums 15, 20
    val e = eventsOfCloses(1L,
      Seq(1.00, 1.01, 1.03, 1.06, 1.10, 1.15, 1.21))
    val r = Breadth85.varianceRatio(e, "user_id", "ts", "value",
        "event_id").collect()(0)
    assert(r.getLong(1) === 6L && r.getLong(2) === 2L)
    // varq = 25/4; var1 = 105/36 -> vr = 6.25 / (5 * 105/36)
    val want = BigDecimal((25.0 / 4.0) / (5.0 * (105.0 / 36.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) === want)
  }

  test("varianceRatio: constant moves leave a zero 1-day variance and " +
    "a null VR") {
    val e = eventsOfCloses(2L,
      Seq(1.00, 1.01, 1.02, 1.03, 1.04, 1.05, 1.06))
    val r = Breadth85.varianceRatio(e, "user_id", "ts", "value",
        "event_id").collect()(0)
    assert(r.isNullAt(3))
  }

  test("cfVar: the +-1 alternator pins skew 0, excess kurtosis -2, and " +
    "the closed-form modified VaR") {
    // moves +1,-1,+1,-1: m1=0 m2=1 m3=0 m4=1
    val e = eventsOfCloses(1L, Seq(1.00, 1.01, 1.00, 1.01, 1.00))
    val r = Breadth85.cfVar(e, "user_id", "ts", "value", "event_id")
      .collect()(0)
    assert(r.getLong(1) === 4L)
    assert(r.getDouble(2) === 0.0)
    assert(r.getDouble(3) === -2.0)
    val z = -1645.0 / 1000.0
    val zcf = z + (z * z * z - 3.0 * z) * (-2.0) / 24.0
    val want = BigDecimal(-(0.0 + zcf * 1.0) / 100.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) === want)
  }

  test("drawdownAtRisk: rank-exact p95 lands on ceil(19n/20) and the " +
    "max depth is exact") {
    // cents 100, 90, 95, 80 -> dd 0, 10, 5, 20; n=4 ->
    // p95 row = (19*4+19) div 20 = 4 -> 20
    val e = eventsOfCloses(1L, Seq(1.00, 0.90, 0.95, 0.80))
    val r = Breadth85.drawdownAtRisk(e, "user_id", "ts", "value",
        "event_id").collect()(0)
    assert(r.getLong(1) === 4L)
    assert(r.getLong(2) === 20L)
    assert(r.getLong(3) === 20L)
  }

  test("drawdownAtRisk: at n=20 the p95 row is the 19th smallest depth") {
    // closes: 1.00 then 19 days of 0.99 except one 0.80 dip ->
    // dd cents: 0, then 18 x 1, one 20 -> sorted 19th = 1
    val closes = 1.00 +: (1 to 19).map(i =>
      if (i == 10) 0.80 else 0.99)
    val r = Breadth85.drawdownAtRisk(eventsOfCloses(1L, closes),
        "user_id", "ts", "value", "event_id").collect()(0)
    assert(r.getLong(1) === 20L)
    assert(r.getLong(2) === 1L)
    assert(r.getLong(3) === 20L)
  }
}
