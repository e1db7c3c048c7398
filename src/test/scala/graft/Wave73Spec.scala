package graft

import graft.queries.Breadth71
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the seventy-second wave (Breadth71 Awesome
  * Oscillator / Mann-Whitney U / Theil index). */
class Wave73Spec extends SparkSpec {
  import spark.implicits._

  private def eventsOfCloses(user: Long, closes: Seq[Double]) =
    closes.zipWithIndex.map { case (v, i) =>
      (user, i.toLong, f"2024-01-${i + 1}%02d 10:00:00", v)
    }.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("awesomeOsc: (2,3) windows on a hand series — integer sums, " +
    "warm-up null") {
    // one tick per day -> high = low = close -> m2 = 2c
    val closes = Seq(1.00, 1.10, 1.30, 1.20)
    val e = eventsOfCloses(1L, closes)
    val got = Breadth71.awesomeOsc(e, "user_id", "ts", "value", "event_id",
        fast = 2, slow = 3)
      .collect().map(r =>
        if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
    val m2 = Seq(200L, 220L, 260L, 240L)
    def ao(i: Int) = Some(
      ((m2(i - 1) + m2(i)).toDouble / 4.0 -
        (m2(i - 2) + m2(i - 1) + m2(i)).toDouble / 6.0) / 100.0)
    assert(got === Seq(None, None, ao(2), ao(3)))
  }

  test("mannWhitney: tie-averaged doubled ranks give the textbook U " +
    "and z on a 5-doc corpus") {
    val docs = Seq(("s1", 5L), ("s1", 7L), ("s2", 5L), ("s2", 9L),
      ("s2", 9L)).toDF("source", "n_chars")
    val got = Breadth71.mannWhitney(docs, "source", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    // ranks: 5,5 -> 1.5 each; 7 -> 3; 9,9 -> 4.5 each
    // s1: R1=4.5, U = 4.5 - 3 = 1.5; z = (2U - n1 n2)/(2 sqrt(n1 n2 (N+1)/12))
    val z1 = (3.0 - 6.0) / (2.0 * math.sqrt(6.0 * 6.0 / 12.0))
    val z2 = (9.0 - 6.0) / (2.0 * math.sqrt(6.0 * 6.0 / 12.0))
    assert(got.map(t => (t._1, t._2, t._3)) ===
      Seq(("s1", 2L, 1.5), ("s2", 3L, 4.5)))
    assert(math.abs(got(0)._4 - z1) < 1e-12)
    assert(math.abs(got(1)._4 - z2) < 1e-12)
  }

  test("theilIndex: micronat-quantized hand value; equal incomes give " +
    "exactly zero; non-positive keys drop") {
    val df = Seq((1L, 60L), (1L, 40L), (2L, 300L), (3L, -5L))
      .toDF("k", "amt")
    val r = Breadth71.theilIndex(df, "k", col("amt")).collect()(0)
    // revenues: k1=100, k2=300 (k3 drops); N=2, S=400
    def q(x: Double) = math.floor(x * 1.0e6 + 0.5).toLong
    val want = (100L * q(math.log(100.0 * 2 / 400)) +
      300L * q(math.log(300.0 * 2 / 400))).toDouble / 400.0 / 1.0e6
    assert(r.getLong(0) === 2L && r.getLong(1) === 400L)
    assert(math.abs(r.getDouble(2) - want) < 1e-15)
    val eq = Seq((1L, 70L), (2L, 70L)).toDF("k", "amt")
    assert(Breadth71.theilIndex(eq, "k", col("amt"))
      .collect()(0).getDouble(2) === 0.0)
  }
}
