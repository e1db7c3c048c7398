package graft

import graft.queries.Breadth119
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-twentieth wave (Breadth119 permutation test
  * + BH FDR). */
class Wave125Spec extends SparkSpec {
  import spark.implicits._

  /** Events for one key: a close path from cumulative moves. */
  private def keyEvents(key: Long, moves: Seq[Long]): Seq[(Long, Long,
      String, Double)] = {
    val closes = moves.scanLeft(10000L)(_ + _)
    closes.zipWithIndex.map { case (c, i) =>
      (key, key * 100 + i, f"2024-01-${i + 1}%02d 10:00:00",
        c.toDouble / 100.0) }
  }

  private def toEvents(rows: Seq[(Long, Long, String, Double)]) =
    rows.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("permTest: a monotone trend is extreme (only all-equal sign " +
    "flips tie it), a perfectly alternating path has p = 1") {
    val e = toEvents(
      keyEvents(1L, Seq.fill(12)(10L)) ++                // trend
      keyEvents(2L, (0 until 12).map(i => if (i % 2 == 0) 10L else -10L)))
    val got = Breadth119.permTest(e, "user_id", "ts", "value", "event_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (n1, t1, num1, p1) = got(1L)
    assert(n1 === 12L && t1 === 120L)
    // T_obs is the maximum attainable |Σ±x|, so only an all-equal sign
    // vector ties it — p sits at the bottom of the scale
    assert(num1 <= 5L && p1 === num1.toDouble / 65.0)
    val (_, t2, num2, p2) = got(2L)
    assert(t2 === 0L)           // alternating moves cancel exactly
    assert(num2 === 65L && p2 === 1.0)  // every |Σ±x| ≥ 0
  }

  test("bhFdr: the trending key rejects, the null keys do not, ranks " +
    "are the p order") {
    val e = toEvents(
      keyEvents(1L, Seq.fill(12)(10L)) ++
      keyEvents(2L, (0 until 12).map(i => if (i % 2 == 0) 10L else -10L)) ++
      keyEvents(3L, (0 until 12).map(i => if (i % 2 == 0) -20L else 20L)))
    val got = Breadth119.bhFdr(e, "user_id", "ts", "value", "event_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getBoolean(4))).toMap
    val (num1, rank1, rej1) = got(1L)
    // m = 3, α = 1/10: rank-1 rejects iff num·30 ≤ 65 → num ≤ 2
    assert(rank1 === 1L)
    assert(rej1 === (num1 * 30L <= 65L))
    // with 12 moves only the two all-equal sign vectors can tie T_obs —
    // the 64 md5 draws contain neither, so the rejection branch FIRES
    assert(num1 === 1L && rej1)
    assert(!got(2L)._3 && !got(3L)._3)
    assert(Set(got(2L)._2, got(3L)._2) === Set(2L, 3L))
  }

  test("bhFdr step-up: every rank below a qualifying rank rejects " +
    "even if its own compare fails") {
    // direct check of the step-up rule on a crafted p table is not
    // reachable through the public API (p comes from the permutation);
    // instead pin the cross-multiplied compare itself at the boundary:
    // num/65 ≤ 0.1·i/m ⟺ num·10·m ≤ 65·i for the exact boundary case
    // num = 13, i = 2, m = 10 → 13·100 = 1300 ≤ 130? no;
    // num = 1, i = 2, m = 10 → 100 ≤ 130 → yes
    assert(!(13L * 10L * 10L <= 65L * 2L))
    assert(1L * 10L * 10L <= 65L * 2L)
  }
}
