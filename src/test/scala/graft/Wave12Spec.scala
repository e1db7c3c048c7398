package graft

import graft.queries.Breadth12
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the twelfth wave (Breadth12 market
  * microstructure): every assertion is hand-computable from the fixture,
  * independent of the DuckDB oracle. */
class Wave12Spec extends SparkSpec {
  import spark.implicits._

  /** Ticks at an explicit minute offset within one day. */
  private def ticks(rows: Seq[(Long, Double, Long, Int)]) =
    rows.toDF("user_id", "value", "event_id", "minute")
      .withColumn("ts", to_timestamp_ntz(
        concat(lit("2024-01-01 00:"), format_string("%02d", col("minute")), lit(":00"))))
      .drop("minute")

  test("twap: dwell-weighted price; the last tick carries no weight") {
    // price 1.00 held 1 min, then 3.00 held 3 min, then 5.00 (no dwell):
    // twap = (100*60e6 + 300*180e6)/(240e6) / 100 = (100 + 900)/4/100 = 2.5
    val got = Breadth12.twap(
      ticks(Seq((1L, 1.0, 1L, 0), (1L, 3.0, 2L, 1), (1L, 5.0, 3L, 4))),
      "user_id", "ts", "value", "event_id")
      .select("user_id", "day", "n_ticks", "twap")
      .as[(Long, java.sql.Date, Long, Double)].head()
    assert(got._3 === 3L && got._4 === 2.5)
  }

  test("twap: single-tick and zero-span days degrade to the max cent price") {
    val single = Breadth12.twap(
      ticks(Seq((1L, 7.25, 1L, 0))),
      "user_id", "ts", "value", "event_id")
      .select("twap").as[Double].head()
    assert(single === 7.25)
    // two ticks at the SAME instant: no dwell anywhere -> max price wins
    val zeroSpan = Breadth12.twap(
      ticks(Seq((2L, 2.0, 1L, 5), (2L, 4.0, 2L, 5))),
      "user_id", "ts", "value", "event_id")
      .select("twap").as[Double].head()
    assert(zeroSpan === 4.0)
  }

  test("realized vol: rms of cent moves; single-tick key unscored") {
    // moves +3.00, -4.00 -> sqrt((300^2 + 400^2)/2)/100 = sqrt(125000)/100
    val got = Breadth12.realizedVol(
      ticks(Seq((1L, 1.0, 1L, 0), (1L, 4.0, 2L, 1), (1L, 0.0, 3L, 2),
        (9L, 5.0, 4L, 0))),
      "user_id", "ts", "value", "event_id")
      .orderBy("user_id")
      .select("user_id", "n_ticks", "n_moves", "sq_move_cents2", "realized_vol")
      .as[(Long, Long, Long, Option[Long], Option[Double])].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 2L, Some(250000L), Some(math.sqrt(125000.0) / 100.0)),
      (9L, 1L, 0L, None, None)))
  }

  test("tick health: largest absolute move and longest silence") {
    // moves +1.00, -2.50; gaps 60e6, 180e6 µs
    val got = Breadth12.tickHealth(
      ticks(Seq((1L, 2.0, 1L, 0), (1L, 3.0, 2L, 1), (1L, 0.5, 3L, 4))),
      "user_id", "ts", "value", "event_id")
      .select("user_id", "n_ticks", "max_move_cents", "longest_gap_us")
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((1L, 3L, 250L, 180000000L)))
  }

  test("Graft wave-12 facade methods match their oracle-checked queries") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
    val e = Tables.events(spark, sf0001)
    assert(rows(Graft.twap(e, "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc, col("day").asc)) ==
      rows(SparkEntry.queries("q_twap")(spark, sf0001)))
    assert(rows(Graft.realizedVol(e, "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc)) ==
      rows(SparkEntry.queries("q_realized_vol")(spark, sf0001)))
    assert(rows(Graft.tickHealth(e, "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc)) ==
      rows(SparkEntry.queries("q_tick_health")(spark, sf0001)))
  }
}
