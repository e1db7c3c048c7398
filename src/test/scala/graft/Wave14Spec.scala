package graft

import graft.queries.Breadth14
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the fourteenth wave (Breadth14 cross-series
  * structure). */
class Wave14Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long, String, String)]) =
    rows.toDF("user_id", "value", "event_id", "at", "props")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  private def tick(u: Long, v: Double, id: Long, at: String, k: Long = 1L) =
    (u, v, id, at, s"""{"k": $k}""")

  test("pair correlation: co-moving series pin +1, mirrored series pin -1") {
    // keys 1,2 move together over 5 days; key 3 mirrors key 1 exactly
    val days = Seq("01", "02", "03", "04", "05")
    val xs = Seq(1.0, 2.0, 3.0, 2.0, 4.0)
    val rows = days.zip(xs).zipWithIndex.flatMap { case ((d, x), i) =>
      Seq(tick(1L, x, i * 10 + 1, s"2024-01-$d 10:00:00"),
        tick(2L, 2 * x, i * 10 + 2, s"2024-01-$d 10:00:00"),
        tick(3L, 10.0 - x, i * 10 + 3, s"2024-01-$d 10:00:00"))
    }
    val got = Breadth14.pairCorrelation(ticks(rows), "user_id", "ts", "value",
      "event_id", minDays = 5, topKeys = 20)
      .orderBy("key_a", "key_b")
      .select("key_a", "key_b", "n_days", "corr_close")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(got === Seq((1L, 2L, 5L, Some(1.0)), (1L, 3L, 5L, Some(-1.0)),
      (2L, 3L, 5L, Some(-1.0))))
  }

  test("pair correlation: constant side and short overlap are unscored") {
    val rows = (1 to 6).flatMap { i =>
      Seq(tick(1L, i.toDouble, i * 10 + 1, f"2024-01-$i%02d 10:00:00"),
        tick(2L, 5.0, i * 10 + 2, f"2024-01-$i%02d 10:00:00")) // constant
    } ++ Seq(tick(3L, 1.0, 100L, "2024-01-01 10:00:00"),
      tick(3L, 2.0, 101L, "2024-01-02 10:00:00")) // only 2 shared days
    val got = Breadth14.pairCorrelation(ticks(rows), "user_id", "ts", "value",
      "event_id", minDays = 5, topKeys = 20)
      .select("key_a", "key_b", "corr_close")
      .as[(Long, Long, Option[Double])].collect().toSeq.sortBy(t => (t._1, t._2))
    assert(got.forall(_._3.isEmpty), got.toString)
  }

  test("vwap: quantity-weighted cents; zero total quantity unscored") {
    // 1.00 x3 + 3.00 x1 -> (100*3 + 300*1)/4/100 = 1.50
    val got = Breadth14.vwap(ticks(Seq(
      tick(1L, 1.0, 1L, "2024-01-01 10:00:00", k = 3),
      tick(1L, 3.0, 2L, "2024-01-01 11:00:00", k = 1),
      tick(2L, 9.0, 3L, "2024-01-01 10:00:00", k = 0))),
      "user_id", "ts", "value", "k")
      .orderBy("user_id")
      .select("user_id", "n_ticks", "total_qty", "vwap")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(got === Seq((1L, 2L, 4L, Some(1.5)), (2L, 1L, 0L, None)))
  }

  test("Graft wave-14 facade methods match their oracle-checked queries") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
    val e = Tables.events(spark, sf0001)
    assert(rows(Graft.pairCorrelation(e, "user_id", "ts", "value", "event_id")
        .orderBy(col("key_a").asc, col("key_b").asc)) ==
      rows(SparkEntry.queries("q_pair_corr")(spark, sf0001)))
    assert(rows(Graft.vwap(e, "user_id", "ts", "value", "k")
        .orderBy(col("user_id").asc, col("day").asc)) ==
      rows(SparkEntry.queries("q_vwap")(spark, sf0001)))
  }
}
