package graft

import graft.queries.Breadth17
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the seventeenth wave (Breadth17 Bollinger
  * breakout screening). */
class Wave17Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long)]) =
    rows.toDF("user_id", "value", "event_id")
      .withColumn("ts", to_timestamp_ntz(
        concat(lit("2024-01-01 00:"), format_string("%02d", col("event_id")), lit(":00"))))

  test("bollinger: prior-window band; spike flags up; exact 2-sigma stays quiet") {
    // ticks 1.00 x5, then 3.00, then 9.00. Row 6 screens against the
    // flat prior window [1x5]: band 0, any move up flags. Row 7 screens
    // against [1,1,1,1,3]: sx=700, varn=160000, dev=5*900-700=3800,
    // dev^2 >> 4*varn -> up.
    val got = Breadth17.bollinger(ticks(Seq(
      (1L, 1.0, 1L), (1L, 1.0, 2L), (1L, 1.0, 3L), (1L, 1.0, 4L),
      (1L, 1.0, 5L), (1L, 3.0, 6L), (1L, 9.0, 7L))),
      "user_id", "ts", "value", "event_id", w = 5, k = 2)
      .orderBy("event_id")
      .select("event_id", "mid", "band", "breakout_up", "breakout_dn")
      .as[(Long, Double, Double, Boolean, Boolean)].collect().toSeq
    assert(got.size === 2)
    assert(got(0) === ((6L, 1.0, 0.0, true, false)))
    // prior window [100,100,100,100,300] cents: mid 1.40, sigma 80 -> band 1.60
    assert(got(1)._1 === 7L && got(1)._2 === 1.4 && got(1)._3 === 1.6)
    assert(got(1)._4 && !got(1)._5)
    // exactly 2 sigma: current 3.00 against [1,1,1,1,3] gives
    // dev=800, dev^2 = 4*varn = 640000 -> strict inequality stays quiet
    val boundary = Breadth17.bollinger(ticks(Seq(
      (2L, 1.0, 1L), (2L, 1.0, 2L), (2L, 1.0, 3L), (2L, 1.0, 4L),
      (2L, 3.0, 5L), (2L, 3.0, 6L))),
      "user_id", "ts", "value", "event_id", w = 5, k = 2)
      .select("breakout_up", "breakout_dn").as[(Boolean, Boolean)].head()
    assert(boundary === ((false, false)))
  }

  test("bollinger: a crash below the band flags breakout_dn") {
    val got = Breadth17.bollinger(ticks(Seq(
      (1L, 5.0, 1L), (1L, 5.1, 2L), (1L, 4.9, 3L), (1L, 5.0, 4L),
      (1L, 5.0, 5L), (1L, 0.5, 6L))),
      "user_id", "ts", "value", "event_id", w = 5, k = 2)
      .select("breakout_up", "breakout_dn")
      .as[(Boolean, Boolean)].head()
    assert(got === ((false, true)))
  }

  test("Graft wave-17 facade method matches its oracle-checked query") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
    val e = Tables.events(spark, sf0001)
    assert(rows(Graft.bollinger(e, "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc, col("event_id").asc)) ==
      rows(SparkEntry.queries("q_bollinger")(spark, sf0001)))
  }
}
