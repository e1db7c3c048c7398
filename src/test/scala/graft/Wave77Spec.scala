package graft

import graft.queries.Breadth75
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the seventy-sixth wave (Breadth75 trend R²
  * / volatility regime / sign entropy). */
class Wave77Spec extends SparkSpec {
  import spark.implicits._

  private def eventsOfCloses(user: Long, closes: Seq[Double]) =
    closes.zipWithIndex.map { case (v, i) =>
      (user, user * 100 + i, f"2024-01-${i + 1}%02d 10:00:00", v)
    }.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("trendR2: a perfectly linear series has r2 == 1 and the exact " +
    "slope; a flat series has slope 0 and no r2") {
    val e = eventsOfCloses(1L, Seq(1.00, 1.05, 1.10, 1.15)) // +5/bar
      .unionAll(eventsOfCloses(2L, Seq(2.00, 2.00, 2.00)))
    val got = Breadth75.trendR2(e, "user_id", "ts", "value", "event_id")
      .collect()
    val r1 = got.find(_.getLong(0) == 1L).get
    assert(r1.getDouble(2) === 5.0)
    assert(r1.getDouble(3) === 1.0)
    val r2 = got.find(_.getLong(0) == 2L).get
    assert(r2.getDouble(2) === 0.0) // vx > 0, num = 0
    assert(r2.isNullAt(3))          // vy = 0 -> unscored
  }

  test("volRegime: w=2 cross-multiplied verdict against the hand mean") {
    // moves: 1, 5, 1, 1 -> xx: 1, 25, 1, 1; total 28, n=4 (mean 7)
    val e = eventsOfCloses(1L, Seq(1.00, 1.01, 1.06, 1.07, 1.08))
    val got = Breadth75.volRegime(e, "user_id", "ts", "value", "event_id",
        w = 2)
      .collect().map(r => (
        if (r.isNullAt(2)) None else Some(r.getBoolean(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    // windows: [1], [1,25], [25,1], [1,1] -> sums -, 26, 26, 2
    // verdict: 26·4 > 28·2 true, true, 2·4 > 56 false
    assert(got.map(_._1) === Seq(None, Some(true), Some(true),
      Some(false)))
    assert(got(1)._2.get === (26.0 / 2.0) / (28.0 / 4.0))
    assert(got(3)._2.get === (2.0 / 2.0) / (28.0 / 4.0))
  }

  test("signEntropy: balanced up/down is 1 bit, all-up is 0, " +
    "three-way uniform is log2(3)") {
    val e = eventsOfCloses(1L, Seq(1.00, 1.01, 1.00, 1.01, 1.00)) // 2up 2dn
      .unionAll(eventsOfCloses(2L, Seq(2.00, 2.01, 2.02)))        // 2 up
      .unionAll(eventsOfCloses(3L, Seq(3.00, 3.01, 3.00, 3.00)))  // u d f
    val got = Breadth75.signEntropy(e, "user_id", "ts", "value",
        "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got(0) === ((1L, 2L, 2L, 0L, 1.0)))
    assert(got(1) === ((2L, 2L, 0L, 0L, 0.0)))
    assert(got(2)._5 === math.rint(
      math.log(3.0) / math.log(2.0) * 1e6) / 1e6)
  }
}
