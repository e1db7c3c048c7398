package graft

import graft.queries.Breadth42
import org.apache.spark.sql.functions._

/** Closed-form fixture for the forty-second wave (Breadth42 lead-lag). */
class Wave42Spec extends SparkSpec {
  import spark.implicits._

  private def day(i: Int) =
    java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1).toString + " 10:00:00"

  private def ticks(rows: Seq[(Long, Long, Int)]) =
    rows.zipWithIndex.map { case ((k, c, d), i) =>
      (k, c.toDouble / 100.0, i.toLong + 1, day(d))
    }.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", lit("{}"))

  test("leadLag: key 2 copying key 1's move one day later scores " +
    "xcorr 1 at lag +1 and flags it best") {
    // key 1 moves: +10,-10,+20,-20,+30,-30,... ; key 2 repeats each of
    // key 1's moves ONE day later (b at d+1 == a at d)
    val moves = Seq(10L, -10L, 20L, -20L, 30L, -30L, 15L, -15L, 25L, -25L)
    val c1 = moves.scanLeft(1000L)(_ + _) // 11 closes
    val c2 = (1000L +: moves.scanLeft(1000L)(_ + _)) // shifted by a day
    val rows = c1.zipWithIndex.map { case (c, i) => (1L, c, i + 1) } ++
      c2.zipWithIndex.map { case (c, i) => (2L, c, i + 1) }
    val got = Breadth42.leadLag(ticks(rows),
      "user_id", "ts", "value", "event_id")
      .orderBy("lag")
      .select("key_a", "key_b", "lag", "xcorr", "is_best")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getBoolean(4))).toSeq
    assert(got.map(_._3) === Seq(-2L, -1L, 0L, 1L, 2L))
    val atPlus1 = got.find(_._3 == 1L).get
    assert(atPlus1._4.exists(v => math.abs(v - 1.0) < 1e-12),
      s"lag +1 should be ~1, got ${atPlus1._4}")
    assert(atPlus1._5, "lag +1 is the best")
    assert(got.count(_._5) === 1, "exactly one best per pair")
  }
}
