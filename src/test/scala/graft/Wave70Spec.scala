package graft

import graft.queries.Breadth68
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the sixty-ninth wave (Breadth68 Jarque-Bera
  * / degree assortativity / tail order statistics). */
class Wave70Spec extends SparkSpec {
  import spark.implicits._

  private def eventsOf(rows: Seq[(Long, Long, String, Double)]) =
    rows.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  private def eventsOfCloses(user: Long, closes: Seq[Double]) =
    eventsOf(closes.zipWithIndex.map { case (v, i) =>
      (user, i.toLong, f"2024-01-${i + 1}%02d 10:00:00", v)
    })

  test("jarqueBera: matches an independent Scala derivation and the " +
    "zero-variance series is unscored") {
    // key 1: moves +1,+2,+9,-3,+1 cents; key 2: constant moves (+1 x4).
    val e = eventsOfCloses(1L, Seq(1.00, 1.01, 1.03, 1.12, 1.09, 1.10))
      .unionAll(eventsOfCloses(2L, Seq(2.00, 2.01, 2.02, 2.03, 2.04)))
    val got = Breadth68.jarqueBera(e, "user_id", "ts", "value", "event_id")
      .collect()
    // independent: raw moments of (1,2,9,-3,1)
    val xs = Seq(1.0, 2.0, 9.0, -3.0, 1.0)
    val n = xs.size.toDouble
    val m1 = xs.sum / n
    val m2 = xs.map(x => x * x).sum / n
    val m3 = xs.map(x => x * x * x).sum / n
    val m4 = xs.map(x => x * x * x * x).sum / n
    val vr = m2 - m1 * m1
    val sk = (m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1) / (vr * math.sqrt(vr))
    val ku = (m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2 -
      3.0 * m1 * m1 * m1 * m1) / (vr * vr) - 3.0
    val jb = n / 6.0 * (sk * sk + ku * ku / 4.0)
    val r1 = got.find(_.getLong(0) == 1L).get
    assert(r1.getLong(1) === 5L)
    assert(math.abs(r1.getDouble(2) - math.rint(jb * 1e6) / 1e6) < 1e-9)
    assert(r1.getBoolean(3) === (jb < Breadth68.JbCrit))
    val r2 = got.find(_.getLong(0) == 2L).get
    assert(r2.isNullAt(2) && r2.isNullAt(3))
  }

  test("assortativity: a star graph is perfectly disassortative, a " +
    "4-cycle is degenerate (zero degree variance)") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val s = Breadth68.assortativity(star).collect()(0)
    assert(s.getLong(0) === 3L && s.getLong(1) === 6L)
    assert(s.getDouble(2) === -1.0)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("id_a", "id_b")
    val c = Breadth68.assortativity(cyc).collect()(0)
    assert(c.getLong(0) === 4L && c.isNullAt(2))
  }

  test("tailRatio: exact rank selection on a 10-move series, downside " +
    "guard nulls a non-negative p10") {
    // closes 1.00 then +1..+10 shuffled; moves are a permutation of
    // 1..10 minus... construct moves directly: -5,-1,2,3,4,6,7,8,9,12
    val moves = Seq(-5, -1, 2, 3, 4, 6, 7, 8, 9, 12)
    val closes = moves.scanLeft(100)(_ + _).map(_ / 100.0)
    val e = eventsOfCloses(1L, closes)
    val r = Breadth68.tailRatio(e, "user_id", "ts", "value", "event_id")
      .collect()(0)
    // cnt=10: p10 rank ceil(10/10)=1 -> -5; p90 rank ceil(90/10)=9 -> 9
    assert(r.getLong(1) === 10L)
    assert(r.getLong(2) === -5L && r.getLong(3) === 9L)
    assert(r.getDouble(4) === 9.0 / 5.0)
    // all-positive moves: p10 >= 0 -> ratio null
    val up = Breadth68.tailRatio(
      eventsOfCloses(2L, Seq(1.00, 1.01, 1.03, 1.06, 1.10)),
      "user_id", "ts", "value", "event_id").collect()(0)
    assert(up.getLong(2) === 1L && up.isNullAt(4))
  }
}
