package graft

import graft.queries.Breadth16
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the sixteenth wave (Breadth16 dashboard
  * digests). */
class Wave16Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long, String)]) =
    rows.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("seasonality: ISO day-of-week cells with exact cent averages") {
    // 2024-01-01 is a Monday (ISO dow 1); 2024-01-07 a Sunday (7)
    val got = Breadth16.seasonality(ticks(Seq(
      (1L, 1.0, 1L, "2024-01-01 09:10:00"),
      (1L, 2.0, 2L, "2024-01-01 09:50:00"),
      (1L, 5.0, 3L, "2024-01-07 23:00:00"))),
      "ts", "value")
      .orderBy("dow_iso", "hh")
      .select("dow_iso", "hh", "n_ticks", "avg_price")
      .as[(Int, Int, Long, Double)].collect().toSeq
    assert(got === Seq((1, 9, 2L, 1.5), (7, 23, 1L, 5.0)))
  }

  test("top movers: ranked by absolute close-to-close change, first day excluded") {
    val got = Breadth16.topMovers(ticks(Seq(
      (1L, 5.0, 1L, "2024-01-01 10:00:00"), (1L, 2.0, 2L, "2024-01-02 10:00:00"),
      (1L, 2.5, 3L, "2024-01-03 10:00:00"),
      (2L, 1.0, 4L, "2024-01-01 10:00:00"), (2L, 9.0, 5L, "2024-01-02 10:00:00"))),
      "user_id", "ts", "value", "event_id", k = 2)
      .select("user_id", "move_cents")
      .as[(Long, Long)].collect().toSeq
    // moves: u1 -300, +50; u2 +800 -> top-2 by |move|: +800, -300
    assert(got === Seq((2L, 800L), (1L, -300L)))
  }

  test("Graft wave-16 facade methods match their oracle-checked queries") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
    val e = Tables.events(spark, sf0001)
    assert(rows(Graft.seasonality(e, "ts", "value")
        .orderBy(col("dow_iso").asc, col("hh").asc)) ==
      rows(SparkEntry.queries("q_seasonality")(spark, sf0001)))
    assert(rows(Graft.topMovers(e, "user_id", "ts", "value", "event_id")) ==
      rows(SparkEntry.queries("q_top_movers")(spark, sf0001)))
  }
}
