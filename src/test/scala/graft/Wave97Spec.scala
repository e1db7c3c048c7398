package graft

import graft.queries.Breadth94
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the ninety-fifth wave (Breadth94 turn of
  * month / anchored VWAP / lognormal fit). */
class Wave97Spec extends SparkSpec {
  import spark.implicits._

  test("turnOfMonth: move days bucket by rank from both month ends") {
    // closes 100,101,103,100,96,101,107 -> moves +1,+2,-3,-4,+5,+6
    // on Jan 2..7: open {1,2}, mid {-3,-4}, close {5,6}
    val closes = Seq(1.00, 1.01, 1.03, 1.00, 0.96, 1.01, 1.07)
    val e = closes.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong, f"2024-01-${i + 1}%02d 10:00:00", v)
    }.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth94.turnOfMonth(e, "user_id", "ts", "value",
        "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got === Seq(
      ("close", 2L, 5.5, 1.0),
      ("mid", 2L, -3.5, 0.0),
      ("open", 2L, 1.5, 1.0)))
  }

  test("anchoredVwap: the running ratio restarts at each month and " +
    "stays null until quantity arrives") {
    val e = Seq(
      (1L, 0L, "2024-01-01 10:00:00", 9.99, """{}"""),       // q=0
      (1L, 1L, "2024-01-02 10:00:00", 1.00, """{"k":10}"""),
      (1L, 2L, "2024-01-03 10:00:00", 1.20, """{"k":10}"""),
      (1L, 3L, "2024-02-01 10:00:00", 2.00, """{"k":5}"""))
      .toDF("user_id", "event_id", "at", "value", "props")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth94.anchoredVwap(e, "user_id", "ts", "value",
        "event_id", "k")
      .collect().map(r =>
        if (r.isNullAt(3)) None else Some(r.getDouble(3))).toSeq
    assert(got === Seq(None, Some(1.0), Some(1.1), Some(2.0)))
  }

  test("priceLognorm: quantized log moments give the hand mu/sigma") {
    val customer = Seq((1L, "BUILDING")).toDF("c_custkey", "c_mktsegment")
    val orders = Seq((10L, 1L, 100.0), (11L, 1L, 10000.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val l = Seq(100.0, 10000.0)
      .map(p => math.floor(math.log(p) * 1e6 + 0.5).toLong)
    val n = 2L; val s1 = l.sum; val s2 = l.map(x => x * x).sum
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val mu = s1.toDouble / n.toDouble / 1e6
    val sigma = math.sqrt(n.toDouble * s2.toDouble -
      s1.toDouble * s1.toDouble) / n.toDouble / 1e6
    val r = Breadth94.priceLognorm(customer, orders).collect()(0)
    assert(r.getLong(1) === 2L)
    assert(r.getDouble(2) === r6(mu))
    assert(r.getDouble(3) === r6(sigma))
    assert(r.getDouble(4) === r6(math.exp(mu)))
  }
}
