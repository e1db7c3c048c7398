package graft

import graft.queries.Breadth41
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the forty-first wave (Breadth41 runs test
  * + momentum ranks). */
class Wave41Spec extends SparkSpec {
  import spark.implicits._

  private def day(i: Int) =
    java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1).toString + " 10:00:00"

  private def ticks(rows: Seq[(Long, Long, Int)]) =
    rows.zipWithIndex.map { case ((k, c, d), i) =>
      (k, c.toDouble / 100.0, i.toLong + 1, day(d))
    }.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", lit("{}"))

  private def series(closes: Seq[Long], key: Long = 1L) =
    closes.zipWithIndex.map { case (c, i) => (key, c, i + 1) }

  test("runsTest: a perfect alternation maximizes runs (R = n) and a " +
    "two-block series minimizes them (R = 2); z matches the closed " +
    "form; flat days drop") {
    // alternation: +,-,+,-,+,- -> n=6, n+=3, n-=3, R=6
    val alt = Seq(1000L, 1010L, 1000L, 1010L, 1000L, 1010L, 1000L)
    val gotA = Breadth41.runsTest(ticks(series(alt)),
      "user_id", "ts", "value", "event_id")
      .select("n_signs", "n_up", "n_down", "n_runs", "runs_z")
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    assert((gotA._1, gotA._2, gotA._3, gotA._4) === ((6L, 3L, 3L, 6L)))
    val mu = 2.0 * 9.0 / 6.0 + 1.0
    val z = (6.0 - mu) / math.sqrt((mu - 1.0) * (mu - 2.0) / 5.0)
    assert(gotA._5.contains(z))
    // blocks: +,+,+,-,-,- with a flat day in the middle (drops)
    val blk = Seq(1000L, 1010L, 1020L, 1030L, 1030L, 1020L, 1010L, 1000L)
    val gotB = Breadth41.runsTest(ticks(series(blk, key = 2L)),
      "user_id", "ts", "value", "event_id")
      .select("n_signs", "n_runs")
      .as[(Long, Long)].collect().head
    assert(gotB === ((6L, 2L)))
    // one-sided series is unscored
    val up = Seq(1000L, 1010L, 1020L, 1030L)
    val gotU = Breadth41.runsTest(ticks(series(up, key = 3L)),
      "user_id", "ts", "value", "event_id")
      .select("runs_z").as[Option[Double]].collect().head
    assert(gotU.isEmpty)
  }

  test("momRank: two keys with known 20-bar returns rank by strength " +
    "with deciles 1 and 10") {
    val rows = (0 until 25).flatMap(i => Seq(
      (1L, 1000L + i * 50, i + 1),  // strong trailing return
      (2L, 5000L + i * 10, i + 1))) // weak trailing return
    val got = Breadth41.momRank(ticks(rows),
      "user_id", "ts", "value", "event_id")
      .orderBy("day", "mom_rank")
      .select("user_id", "mom", "mom_rank", "decile")
      .as[(Long, Double, Long, Long)].collect().toSeq
    assert(got.nonEmpty && got.size % 2 === 0)
    got.grouped(2).foreach { case Seq(a, b) =>
      assert(a._1 === 1L && a._3 === 1L && a._4 === 1L)
      assert(b._1 === 2L && b._3 === 2L && b._4 === 6L)
      assert(a._2 > b._2)
    }
  }
}
