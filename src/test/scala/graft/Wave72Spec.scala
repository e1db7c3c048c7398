package graft

import graft.queries.Breadth70
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the seventy-first wave (Breadth70 Jensen
  * alpha / weekday effect / per-source KL drift). */
class Wave72Spec extends SparkSpec {
  import spark.implicits._

  private def eventsOfCloses(user: Long, closes: Seq[Double]) =
    closes.zipWithIndex.map { case (v, i) =>
      (user, user * 100 + i, f"2024-01-${i + 1}%02d 10:00:00", v)
    }.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("jensenAlpha: hand 2-key panel — exact integer-ratio alpha and " +
    "treynor, negative-beta key unscored") {
    // moves: A +10,-5,+20; B +2,+4,-2; market 12,-1,18
    val e = eventsOfCloses(1L, Seq(1.00, 1.10, 1.05, 1.25))
      .unionAll(eventsOfCloses(2L, Seq(1.00, 1.02, 1.06, 1.04)))
    val got = Breadth70.jensenAlpha(e, "user_id", "ts", "value", "event_id")
      .collect()
    val a1 = got.find(_.getLong(0) == 1L).get
    assert(a1.getLong(1) === 3L)
    // alpha = (Σx − (num/den)·Σm)/n, treynor = (Σx/n)/(num/den) —
    // the pinned IEEE order (num=730, den=566 for key 1)
    assert(a1.getDouble(2) === (25.0 - 730.0 / 566.0 * 29.0) / 3.0)
    assert(a1.getDouble(3) === (25.0 / 3.0) / (730.0 / 566.0))
    val a2 = got.find(_.getLong(0) == 2L).get
    assert(a2.getDouble(2) === (4.0 - -164.0 / 566.0 * 29.0) / 3.0)
    assert(a2.isNullAt(3)) // beta < 0 -> treynor unscored
  }

  test("weekdayEffect: moves land on their ISO weekdays with exact " +
    "means and up-shares") {
    // 2024-01-01 is a Monday; closes Mon..Fri -> moves Tue..Fri
    val e = eventsOfCloses(1L, Seq(1.00, 1.02, 0.99, 1.05, 1.05))
    val got = Breadth70.weekdayEffect(e, "user_id", "ts", "value",
        "event_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got === Seq(
      (2, 1L, 2L, 2.0, 1.0),   // Tue +2
      (3, 1L, -3L, -3.0, 0.0), // Wed -3
      (4, 1L, 6L, 6.0, 1.0),   // Thu +6
      (5, 1L, 0L, 0.0, 0.0)))  // Fri 0
  }

  test("klSource: two-source unigram drift matches the hand-quantized " +
    "microbit sum; identical sources diverge zero") {
    val docs = Seq(("s1", 10L, "a a b"), ("s2", 20L, "a b b b"))
      .toDF("source", "doc_id", "text")
    val got = Breadth70.klSource(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    def lr(c: Long, nc: Long, cc: Long, ns: Long): Long =
      math.floor(math.log(c.toDouble * nc / (cc.toDouble * ns)) /
        math.log(2.0) * 1.0e6 + 0.5).toLong
    // corpus: a:3 b:4, Nc=7; s1: a2 b1 Ns=3; s2: a1 b3 Ns=4
    val kl1 = (2 * lr(2, 7, 3, 3) + 1 * lr(1, 7, 4, 3)).toDouble / 3 / 1.0e6
    val kl2 = (1 * lr(1, 7, 3, 4) + 3 * lr(3, 7, 4, 4)).toDouble / 4 / 1.0e6
    assert(got.map(_._1) === Seq("s1", "s2"))
    assert(got(0)._2 === 3L && got(1)._2 === 4L)
    assert(math.abs(got(0)._3 - kl1) < 1e-12)
    assert(math.abs(got(1)._3 - kl2) < 1e-12)
    // same distribution in both sources -> KL exactly 0 (lr(1·N/(2·(N/2))) = lr(1) = 0)
    val same = Seq(("s1", 1L, "x y"), ("s2", 2L, "x y"))
      .toDF("source", "doc_id", "text")
    val z = Breadth70.klSource(same, "source", "text")
      .collect().map(_.getDouble(2)).toSeq
    assert(z === Seq(0.0, 0.0))
  }
}
