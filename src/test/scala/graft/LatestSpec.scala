package graft

import graft.ops.Latest
import org.apache.spark.sql.functions._

/** Tie + null semantics of latest-per-key (SURVEY.md §7.4.1): the join
  * form must emit ALL rows tied at max ts (reference J1 behavior — ties
  * are guaranteed there by the shared batch timestamp); the window form
  * exactly one, deterministically. */
class LatestSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    // (event_id, user, ts-second, value) — user 1 has a TIE at max ts
    (1L, 1L, 10L, 5.0), (2L, 1L, 20L, 6.0), (3L, 1L, 20L, 7.0),
    (4L, 2L, 30L, 1.0),
    (5L, 3L, 5L, 9.0), (6L, 3L, 4L, 8.0)
  ).toDF("event_id", "user_id", "sec", "value")
    .withColumn("ts", timestamp_seconds(col("sec")).cast("timestamp_ntz"))

  test("join form emits every max-ts tie") {
    val out = Latest.latestPerKeyJoin(fixture, "user_id", "ts")
      .select("event_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(2L, 3L, 4L, 5L))
  }

  test("window form emits exactly one row per key, greatest tiebreak wins") {
    val out = Latest.latestPerKeyWindow(fixture, Seq("user_id"),
        col("ts").desc, col("event_id").desc)
      .select("user_id", "event_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 4L, 3L -> 5L))
  }

  test("empty input → empty output, both forms") {
    val empty = fixture.limit(0)
    assert(Latest.latestPerKeyJoin(empty, "user_id", "ts").count() == 0)
    assert(Latest.latestPerKeyWindow(empty, Seq("user_id"), col("ts").desc,
      col("event_id").desc).count() == 0)
  }

  test("interpolation: midpoint blend, endpoint clamp, exact-hit identity") {
    val facts = Seq((1L, 1L, 10L, 10.0), (2L, 1L, 20L, 30.0))
      .toDF("event_id", "user_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")).cast("timestamp_ntz"))
    val probes = Seq((1L, 15L), (1L, 5L), (1L, 25L), (1L, 20L))
      .toDF("user_id", "psec")
      .withColumn("probe_ts", timestamp_seconds(col("psec")).cast("timestamp_ntz"))
    val out = graft.ops.Interpolate.linearAtProbes(
        facts, probes, "user_id", "ts", "value", "probe_ts", "event_id")
      .withColumn("p", unix_timestamp(col("probe_ts").cast("timestamp")))
      .select("p", "interp_value").as[(Long, Double)].collect().toMap
    assert(out(15L) == 20.0) // midpoint of 10..30
    assert(out(5L) == 10.0)  // before first fact → clamp to next
    assert(out(25L) == 30.0) // after last fact → clamp to prev
    assert(out(20L) == 30.0) // exact hit → exact value
  }

  test("interpolation never plans Spark's tail-rescan window frame: the " +
    "next-neighbor lookup is the reversed-order running last, O(n) per " +
    "partition (a bounded-lower + UNBOUNDED FOLLOWING frame re-aggregates " +
    "the whole tail per row — O(n²), the q_knn_shapley trap)") {
    val facts = Seq((1L, 1L, 10L, 10.0), (2L, 1L, 20L, 30.0))
      .toDF("event_id", "user_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")).cast("timestamp_ntz"))
    val probes = Seq((1L, 15L)).toDF("user_id", "psec")
      .withColumn("probe_ts", timestamp_seconds(col("psec")).cast("timestamp_ntz"))
    val p = graft.ops.Interpolate.linearAtProbes(
        facts, probes, "user_id", "ts", "value", "probe_ts", "event_id")
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!p.contains("unbounded following"),
      s"tail-rescan frame leaked into the interpolation window:\n${p.take(800)}")
  }

  test("as-of join: inclusive at probe ts, null before first fact") {
    val probes = Seq((1L, 20L), (1L, 15L), (1L, 5L), (2L, 100L))
      .toDF("user_id", "psec")
      .withColumn("probe_ts", timestamp_seconds(col("psec")).cast("timestamp_ntz"))
      .drop("psec")
    val out = Latest.asOfJoin(fixture, probes, "user_id", "ts", "probe_ts",
        "value", "event_id")
      .withColumn("p", unix_timestamp(col("probe_ts").cast("timestamp")))
      .select("user_id", "p", "asof_value")
      .as[(Long, Long, Option[Double])].collect()
      .map { case (u, p, v) => (u, p) -> v }.toMap
    assert(out(1L -> 20L).contains(7.0)) // tie at 20 → max event_id (3) wins
    assert(out(1L -> 15L).contains(5.0))
    assert(out(1L -> 5L).isEmpty)        // before first fact
    assert(out(2L -> 100L).contains(1.0))
  }
}
