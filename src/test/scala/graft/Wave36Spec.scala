package graft

import graft.queries.Breadth36
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the thirty-sixth wave (Breadth36 zigzag
  * pivots + rolling beta). */
class Wave36Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long, String)]) =
    rows.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", lit("{}"))

  private def day(i: Int) =
    java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1).toString + " 10:00:00"

  private def series(closes: Seq[Long], key: Long = 1L) =
    closes.zipWithIndex.map { case (c, i) =>
      (key, c.toDouble / 100.0, i.toLong + 1, day(i + 1))
    }

  test("zigzag: a rise to a peak then a >=5% drop confirms the peak as " +
    "a pivot ON the confirming bar with the PEAK's day; small wiggles " +
    "never confirm") {
    // up to 2000 at day 3, then a 6% drop (1880) confirms at day 4;
    // then a 10% rise (2068) confirms the 1880 trough at day 6
    val closes = Seq(1000L, 1500L, 2000L, 1880L, 1850L, 2068L)
    val got = Breadth36.zigzag(ticks(series(closes)),
      "user_id", "ts", "value", "event_id")
      .orderBy("day")
      .select("leg_up", "leg_extreme_cents", "pivot_cents", "pivot_day")
      .collect().map(r => (r.getBoolean(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDate(3).toString))).toSeq
    assert(got(0) === ((true, 1000L, None, None)))
    assert(got(2) === ((true, 2000L, None, None)))
    // day 4: (2000-1880)*20 = 2400 >= 2000 -> peak 2000@day3 confirmed
    assert(got(3) === ((false, 1880L, Some(2000L), Some("2024-01-03"))))
    // day 5: lower low extends the down leg, no pivot
    assert(got(4) === ((false, 1850L, None, None)))
    // day 6: (2068-1850)*20 = 4360 >= 1850 -> trough 1850@day5 confirmed
    assert(got(5) === ((true, 2068L, Some(1850L), Some("2024-01-05"))))
    // wiggles below 5% never confirm
    val calm = Seq(1000L, 1020L, 990L, 1010L, 985L)
    val gotC = Breadth36.zigzag(ticks(series(calm, key = 2L)),
      "user_id", "ts", "value", "event_id")
      .select("pivot_cents").collect().map(_.isNullAt(0)).toSeq
    assert(gotC.forall(identity))
  }

  test("rollingBeta: a key that IS the whole market scores beta 1 over " +
    "every full window; a key moving at half the market's amplitude " +
    "scores 1/3 against the combined move") {
    // two keys, same days, key1 moves ±20, key2 moves ±10 in sync ->
    // market = ±30; cov(x1,M)=20·30·n/n ... beta1 = 20/30, beta2 = 10/30
    // (perfectly correlated: beta_i = x_i / M)
    val n = 40
    val d1 = (0 until n).map(i => 1000L + (i % 2) * 20)
    val d2 = (0 until n).map(i => 2000L + (i % 2) * 10)
    val rows = series(d1, key = 1L) ++ series(d2, key = 2L)
    val got = Breadth36.rollingBeta(ticks(rows),
      "user_id", "ts", "value", "event_id")
      .groupBy("user_id").agg(min("beta").as("mn"), max("beta").as("mx"))
      .orderBy("user_id")
      .as[(Long, Double, Double)].collect().toSeq
    assert(got.size === 2)
    // x1 = ±20, M = ±30 -> slope 2/3 exactly, constant over windows
    assert(got(0)._2 === 2.0 / 3.0 && got(0)._3 === 2.0 / 3.0)
    assert(got(1)._2 === 1.0 / 3.0 && got(1)._3 === 1.0 / 3.0)
  }
}
