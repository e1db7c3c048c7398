package graft

import graft.queries.{Breadth8, Stores}
import org.apache.spark.sql.functions._

/** Edge-case semantics for the eighth relational wave — the properties
  * the DuckDB differential can't isolate: skyline dominance as a
  * property (not a mirrored formulation), island splitting on exact gap
  * shapes, time-travel generation commitment, and MAD's robustness to
  * the outliers it screens (the property that justifies it over a
  * stddev z-score).
  */
class WarehouseOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q_skyline: kept rows are mutually non-dominated and every " +
    "dropped size is dominated by some kept row") {
    val agg = graft.Tables.part(spark, sf0001)
      .groupBy(col("p_size"))
      .agg(min(col("p_retailprice")).as("best_price"))
      .as[(Int, Double)].collect().toSeq
    val kept = Breadth8.defs("q_skyline")(spark, sf0001)
      .select("p_size", "best_price").as[(Int, Double)].collect().toSeq
    def dominates(a: (Int, Double), b: (Int, Double)) =
      a._1 <= b._1 && a._2 <= b._2 && (a._1 < b._1 || a._2 < b._2)
    for (a <- kept; b <- kept if a != b)
      assert(!dominates(a, b), s"$a dominates kept $b")
    val keptSet = kept.toSet
    for (d <- agg if !keptSet.contains(d))
      assert(kept.exists(k => dominates(k, d)), s"dropped $d undominated")
    assert(kept.nonEmpty)
  }

  test("gaps-islands splits on a single missing day and counts " +
    "singleton streaks") {
    // user 1: days 1-3, then 5 (gap at 4) -> streaks [3, 1];
    // user 2: one day -> one singleton streak.
    val df = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-03"),
      (1L, "2024-01-05"), (2L, "2024-03-01"))
      .toDF("user_id", "d")
      .select(col("user_id"),
        to_timestamp_ntz(concat(col("d"), lit(" 12:00:00"))).as("ts"))
    // drive the PRODUCTION operator, not a re-typed copy of it
    val out = graft.ops.Streaks.streakSummary(df, "user_id", "ts")
      .select("user_id", "n_streaks", "max_streak")
      .as[(Long, Long, Long)].collect().toMap2
    assert(out(1L) == ((2L, 3L)))
    assert(out(2L) == ((1L, 1L)))
  }

  test("time-travel store: both generations committed, asof differs " +
    "from now for at least one user, insert-shaped changes flagged") {
    val root = Stores.userStateGens(spark, sf0001)
    for (g <- Seq(0, 1))
      assert(new java.io.File(s"$root/batch_id=$g/_SUCCESS").exists(),
        s"generation $g not committed")
    val out = Breadth8.defs("q_time_travel")(spark, sf0001).collect()
    // every user with a differing (or missing) asof value is changed
    out.foreach { r =>
      val asof = Option(r.getAs[java.lang.Double]("value_asof"))
      val now = Option(r.getAs[java.lang.Double]("value_now"))
      assert(r.getAs[Boolean]("changed") == (asof != now))
    }
    assert(out.exists(_.getAs[Boolean]("changed")),
      "no user changed across the cutoff — degenerate fixture")
  }

  test("rolling 7-day actives dominate the daily actives and never " +
    "exceed the total user population") {
    val daily = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      .groupBy("day").agg(countDistinct("user_id").as("d1"))
    val rolling = Breadth8.defs("q_rolling_active")(spark, sf0001)
    val joined = rolling.join(daily, Seq("day"))
      .select("active_7d", "d1").as[(Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (r, d) => assert(r >= d) }
    val users = Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    assert(rolling.agg(max("active_7d")).as[Long].collect().head <= users)
  }

  test("keyset page: every row satisfies the cursor predicate and the " +
    "page is a pushed-filter TakeOrderedAndProject") {
    val df = Breadth8.defs("q_keyset_page")(spark, sf0001)
    val rows = df.select("o_totalprice", "o_orderkey")
      .as[(Double, Long)].collect()
    assert(rows.length <= 25 && rows.nonEmpty)
    rows.foreach { case (p, k) =>
      assert(p < 100000.0 || (p == 100000.0 && k > 0L))
    }
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject(limit=25"), plan.take(400))
    assert(plan.contains("PushedFilters:") &&
      plan.contains("LessThan(o_totalprice,100000.0)"),
      "cursor predicate not pushed to the scan")
  }

  test("partition stats: shares bounded by 1 with the max day at " +
    "exactly 1.0, and row counts conserve the event log") {
    val out = queries.Stores.defs("q_partition_stats")(spark, sf0001)
      .select("n_rows", "share_of_max").as[(Long, Double)].collect()
    assert(out.map(_._2).max == 1.0)
    assert(out.forall { case (_, s) => s > 0.0 && s <= 1.0 })
    val total = Tables.events(spark, sf0001).count()
    assert(out.map(_._1).sum == total)
  }

  test("MAD screen is robust to the outlier it hunts: one 1000x spike " +
    "flags only itself, while the stddev z-score threshold inflates") {
    val vals = (1 to 99).map(i => 10.0 + (i % 7) * 0.5) :+ 10000.0
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, "t", v) }
      .toDF("id", "event_type", "value")
    val med = df.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = df.join(med, Seq("event_type"))
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    val flagged = dev.join(mad, Seq("event_type"))
      .filter(col("adev") > col("mad") * lit(3.0))
      .select("value").as[Double].collect().toSeq
    assert(flagged == Seq(10000.0))
    // the z-score screen misses it less cleanly: the spike inflates
    // stddev so much that 3 sigma still catches ONLY the spike, but the
    // threshold it implies (mean + 3 sigma) is ~100x MAD's — one more
    // spike of half the size would hide. Pin the threshold gap.
    val (mean, std) = df.agg(avg(col("value")), stddev_pop(col("value")))
      .as[(Double, Double)].collect().head
    val madV = mad.select("mad").as[Double].collect().head
    val medV = med.select("med").as[Double].collect().head
    assert(mean + 3 * std > medV + 100 * madV,
      "z-score threshold did not inflate — fixture lost its point")
  }

  private implicit class Tupled[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
