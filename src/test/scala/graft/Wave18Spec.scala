package graft

import graft.queries.Breadth18
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the eighteenth wave (Breadth18 oscillator /
  * volatility-unit indicators). */
class Wave18Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long, String)]) =
    rows.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("stochastic %K: position inside the prior window's range; flat window unscored") {
    // prior window for tick 6: [1.00..5.00]; current 2.00 ->
    // 100*(200-100)/(500-100) = 25.0
    val rows = (1 to 5).map(i =>
      (1L, i.toDouble, i.toLong, f"2024-01-01 10:$i%02d:00")) :+
      ((1L, 2.0, 6L, "2024-01-01 10:06:00")) :+
      // key 2: five flat ticks then anything -> hi == lo -> null %K
      ((2L, 3.0, 11L, "2024-01-01 10:01:00")) :+
      ((2L, 3.0, 12L, "2024-01-01 10:02:00")) :+
      ((2L, 3.0, 13L, "2024-01-01 10:03:00")) :+
      ((2L, 3.0, 14L, "2024-01-01 10:04:00")) :+
      ((2L, 3.0, 15L, "2024-01-01 10:05:00")) :+
      ((2L, 4.0, 16L, "2024-01-01 10:06:00"))
    val got = Breadth18.stochasticK(ticks(rows), "user_id", "ts", "value",
      "event_id", w = 5)
      .orderBy("user_id", "event_id")
      .select("user_id", "event_id", "win_lo", "win_hi", "pct_k")
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got === Seq((1L, 6L, 100L, 500L, Some(25.0)),
      (2L, 16L, 300L, 300L, None)))
  }

  test("atr: true range spans gaps through the prior close; first bar uses high-low") {
    // key 1 daily bars (one tick per day): closes 10, 14, 11, 20
    // TRs: d1 hi-lo=0; d2 |14-10|=4.00=400; d3 300; d4 900
    // first full 3-frame at d3: (0+400+300)/3/100; d4: (400+300+900)/3/100
    val got = Breadth18.atr(ticks(Seq(
      (1L, 10.0, 1L, "2024-01-01 10:00:00"),
      (1L, 14.0, 2L, "2024-01-02 10:00:00"),
      (1L, 11.0, 3L, "2024-01-03 10:00:00"),
      (1L, 20.0, 4L, "2024-01-04 10:00:00"))),
      "user_id", "ts", "value", "event_id", w = 3)
      .orderBy("day")
      .select("true_range_cents", "atr")
      .as[(Long, Double)].collect().toSeq
    assert(got === Seq((300L, 700.0 / 3.0 / 100.0), (900L, 1600.0 / 3.0 / 100.0)))
  }

  test("atr: intraday range beats the gap when larger") {
    // day 2 trades 8.00..15.00 (range 700) around prev close 10.00:
    // TR = max(700, |1500-1000|, |800-1000|) = 700
    val got = Breadth18.atr(ticks(Seq(
      (1L, 10.0, 1L, "2024-01-01 10:00:00"),
      (1L, 8.0, 2L, "2024-01-02 09:00:00"),
      (1L, 15.0, 3L, "2024-01-02 12:00:00"),
      (1L, 9.0, 4L, "2024-01-03 10:00:00"))),
      "user_id", "ts", "value", "event_id", w = 2)
      .orderBy("day")
      .select("true_range_cents").as[Long].collect().toSeq
    assert(got === Seq(700L, 600L)) // d3: |900-1500| = 600 gap dominates
  }

  test("obv: signed quantity accumulates; flat and null-qty ticks hold the line") {
    val rows = Seq(
      (1L, 1.0, 1L, "2024-01-01 10:00:00", """{"k": 5}"""),
      (1L, 2.0, 2L, "2024-01-01 10:01:00", """{"k": 3}"""),  // up: +3
      (1L, 2.0, 3L, "2024-01-01 10:02:00", """{"k": 9}"""),  // flat: 0
      (1L, 1.5, 4L, "2024-01-01 10:03:00", """{}"""),        // down, no qty: -0
      (1L, 0.5, 5L, "2024-01-01 10:04:00", """{"k": 4}"""))  // down: -4
      .toDF("user_id", "value", "event_id", "at", "props")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val got = graft.queries.Breadth18.obv(rows, "user_id", "ts", "value",
      "event_id", "k")
      .orderBy("event_id").select("obv").as[Long].collect().toSeq
    assert(got === Seq(0L, 3L, 3L, 3L, -1L))
  }

  test("Graft wave-18 facade methods match their oracle-checked queries") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
    val e = Tables.events(spark, sf0001)
    assert(rows(Graft.stochasticK(e, "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc, col("event_id").asc)) ==
      rows(SparkEntry.queries("q_stochastic")(spark, sf0001)))
    assert(rows(Graft.atr(e, "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc, col("day").asc)) ==
      rows(SparkEntry.queries("q_atr")(spark, sf0001)))
    assert(rows(Graft.obv(e, "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc, col("event_id").asc)) ==
      rows(SparkEntry.queries("q_obv")(spark, sf0001)))
  }
}
