package graft

import graft.queries.Breadth54
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the fifty-fifth wave (Breadth54 volume
  * structure). */
class Wave54Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Long, Int, Long)]) =
    rows.zipWithIndex.map { case ((k, c, d, v), i) =>
      (k, c.toDouble / 100.0, i.toLong + 1, f"2024-01-$d%02d 10:00:00", v)
    }.toDF("user_id", "value", "event_id", "at", "k")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", concat(lit("{\"k\":"), col("k"), lit("}")))
      .drop("k")

  test("volumeProfile: two price levels land in end buckets with hand " +
    "shares; point of control is the heavier bucket") {
    val got = Breadth54.volumeProfile(ticks(Seq(
        (1L, 100L, 1, 10L), (1L, 100L, 2, 10L), (1L, 199L, 3, 30L))),
        "user_id", "ts", "value", "event_id", "k")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).toSeq
    assert(got === Seq((0L, 2L, 20L, 0.4, false), (9L, 1L, 30L, 0.6, true)))
  }

  test("obvDivergence: rising price on collapsing OBV flags bearish " +
    "divergence on exactly the post-lookback bars") {
    val days = Seq((100L, 5L), (110L, 1L), (90L, 100L), (120L, 1L),
      (80L, 100L), (130L, 1L), (140L, 1L))
    val rows = days.zipWithIndex.map { case ((c, v), i) => (1L, c, i + 1, v) }
    val got = Breadth54.obvDivergence(ticks(rows),
        "user_id", "ts", "value", "event_id", "k")
      .orderBy("day")
      .collect().map(r => (r.getLong(3), r.getBoolean(6), r.getBoolean(7)))
      .toSeq
    // obv: 0, 1, -99, -98, -198, -197, -196 → days 6, 7 emitted
    assert(got === Seq((-197L, true, false), (-196L, true, false)))
  }
}
