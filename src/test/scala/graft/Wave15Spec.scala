package graft

import graft.queries.Breadth15
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the fifteenth wave (Breadth15 retrospective
  * series reports). */
class Wave15Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long, String)]) =
    rows.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("best trade: buy the trough, sell the later peak; falling series pins 0") {
    // series 5, 2, 6, 1, 3: best = 6.00 - 2.00 = 400 cents (not 6-1: the
    // 1.00 trough comes AFTER the 6.00 peak)
    val got = Breadth15.bestTrade(ticks(Seq(
      (1L, 5.0, 1L, "2024-01-01 10:00:00"), (1L, 2.0, 2L, "2024-01-01 11:00:00"),
      (1L, 6.0, 3L, "2024-01-01 12:00:00"), (1L, 1.0, 4L, "2024-01-01 13:00:00"),
      (1L, 3.0, 5L, "2024-01-01 14:00:00"),
      (2L, 9.0, 6L, "2024-01-01 10:00:00"), (2L, 4.0, 7L, "2024-01-01 11:00:00"))),
      "user_id", "ts", "value", "event_id")
      .orderBy("user_id")
      .select("user_id", "n_ticks", "best_trade_cents")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 5L, 400L), (2L, 2L, 0L)))
  }

  test("user churn: first/last appearances per day, zero-filled interior days") {
    val got = Breadth15.userChurn(ticks(Seq(
      (1L, 1.0, 1L, "2024-01-01 10:00:00"), (1L, 1.0, 2L, "2024-01-02 10:00:00"),
      (1L, 1.0, 3L, "2024-01-03 10:00:00"),
      (2L, 1.0, 4L, "2024-01-02 10:00:00"),
      (3L, 1.0, 5L, "2024-01-02 10:00:00"), (3L, 1.0, 6L, "2024-01-02 11:00:00"))),
      "user_id", "ts")
      .orderBy("day")
      .select("n_active", "n_new", "n_gone")
      .as[(Long, Long, Long)].collect().toSeq
    // day1: only u1 (new). day2: u1,u2,u3 active; u2,u3 new AND gone
    // (single-day users). day3: u1 active and gone.
    assert(got === Seq((1L, 1L, 0L), (3L, 2L, 2L), (1L, 0L, 1L)))
  }

  test("Graft wave-15 facade methods match their oracle-checked queries") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
    val e = Tables.events(spark, sf0001)
    assert(rows(Graft.bestTrade(e, "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc)) ==
      rows(SparkEntry.queries("q_best_trade")(spark, sf0001)))
    assert(rows(Graft.userChurn(e, "user_id", "ts")
        .orderBy(col("day").asc)) ==
      rows(SparkEntry.queries("q_user_churn")(spark, sf0001)))
  }
}
