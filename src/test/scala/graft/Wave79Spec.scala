package graft

import graft.queries.Breadth76
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the seventy-seventh wave (Breadth76 ARCH
  * rank ACF / Ljung-Box / mean-reversion half-life). */
class Wave79Spec extends SparkSpec {
  import spark.implicits._

  private def eventsOfCloses(user: Long, closes: Seq[Double]) =
    closes.zipWithIndex.map { case (v, i) =>
      (user, user * 100 + i, f"2024-01-${i + 1}%02d 10:00:00", v)
    }.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("archEffect: magnitude ranks reproduce the hand Pearson on " +
    "monotone-magnitude moves") {
    // moves +1, -2, +3, -4 -> |x| ranks 1,2,3,4 in day order
    val e = eventsOfCloses(1L, Seq(1.00, 1.01, 0.99, 1.02, 0.98))
    val r = Breadth76.archEffect(e, "user_id", "ts", "value", "event_id")
      .collect()(0)
    // rank pairs (2,1),(3,2),(4,3): n=3 sx=9 sy=6 sxy=20 sxx=29 syy=14
    val want = (3.0 * 20 - 9 * 6) /
      (math.sqrt(3.0 * 29 - 81) * math.sqrt(3.0 * 14 - 36))
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === want)
  }

  test("ljungBox: the alternating series' hand Q and verdict; a short " +
    "key is unscored") {
    // moves 1,-1,1,-1,1,-1 (n=6): c=6x, D=216, A=(-180,144,-108,72,-36)
    val e = eventsOfCloses(1L,
        Seq(1.00, 1.01, 1.00, 1.01, 1.00, 1.01, 1.00))
      .unionAll(eventsOfCloses(2L, Seq(2.00, 2.01, 2.02, 2.03)))
    val got = Breadth76.ljungBox(e, "user_id", "ts", "value", "event_id")
      .collect()
    val as = Seq(-180.0, 144.0, -108.0, 72.0, -36.0)
    val qSum = as.zipWithIndex.map { case (a, i) =>
      (a / 216.0) * (a / 216.0) / (6.0 - (i + 1))
    }.reduce(_ + _)
    val want = 6.0 * 8.0 * qSum
    val r1 = got.find(_.getLong(0) == 1L).get
    assert(r1.getDouble(2) === want)
    assert(r1.getBoolean(3) === (want > Breadth76.LbCrit))
    val r2 = got.find(_.getLong(0) == 2L).get
    assert(r2.isNullAt(2) && r2.isNullAt(3)) // 3 moves <= 5 lags
  }

  test("halfLife: an exact AR(1) with slope -0.5 has a one-day " +
    "half-life; a trending key is unscored") {
    val e = eventsOfCloses(1L, Seq(2.00, 1.50, 1.25))
      .unionAll(eventsOfCloses(2L, Seq(1.00, 1.10, 1.20, 1.30)))
    val got = Breadth76.halfLife(e, "user_id", "ts", "value", "event_id")
      .collect()
    val r1 = got.find(_.getLong(0) == 1L).get
    assert(r1.getDouble(2) === -0.5)
    assert(r1.getDouble(3) === 1.0)
    val r2 = got.find(_.getLong(0) == 2L).get
    assert(r2.getDouble(2) === 0.0 || r2.isNullAt(3))
    assert(r2.isNullAt(3)) // b >= 0 -> no reversion half-life
  }
}
