package graft

import graft.queries.Breadth110
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-eleventh wave (Breadth110 PACF /
  * periodogram / turning points). */
class Wave115Spec extends SparkSpec {
  import spark.implicits._

  private def ev(closes: Seq[Int]) =
    closes.zipWithIndex.map { case (c, i) =>
      (1L, i.toLong, f"2024-01-${i + 1}%02d 10:00:00", c.toDouble / 100.0)
    }.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("pacf: Durbin-Levinson over the hand-computed lag correlations") {
    val closes = Seq(100, 210, 150, 340, 260, 410, 300, 520, 430, 600,
      480, 700)
    val moves = closes.sliding(2).map(p => (p(1) - p(0)).toDouble).toSeq
    def r(k: Int): Double = {
      val x = moves.dropRight(k); val y = moves.drop(k)
      val n = x.size.toDouble
      val (sx, sy) = (x.sum, y.sum)
      val sxy = x.zip(y).map(t => t._1 * t._2).sum
      val sxx = x.map(v => v * v).sum; val syy = y.map(v => v * v).sum
      (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    // NOTE the engine pairs (x_t, x_{t-k}) via lag — same set of pairs
    val (r1, r2, r3) = (r(1), r(2), r(3))
    val p2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val a1 = r1 - p2 * r1
    val p3 = (r3 - a1 * r2 - p2 * r1) /
      (1.0 - a1 * r1 - p2 * r2)
    val got = Breadth110.pacf(ev(closes), "user_id", "ts", "value",
      "event_id").collect()(0)
    assert(math.abs(got.getDouble(1) - r1) < 1e-12)
    assert(math.abs(got.getDouble(2) - p2) < 1e-12)
    assert(math.abs(got.getDouble(3) - p3) < 1e-12)
  }

  test("periodogram: a 7-day cycle concentrates power at period 7") {
    // moves follow cos(2πt/7) for 28 moves → 29 closes
    val moves = (0 until 28).map(t =>
      math.round(100.0 * math.cos(2.0 * math.Pi * t / 7.0)).toInt)
    val closes = moves.scanLeft(10000)(_ + _)
    val got = Breadth110.periodogram(ev(closes), "user_id", "ts", "value",
      "event_id").collect()
    val p7 = got.find(_.getLong(1) == 7L).get.getDouble(3)
    val p30 = got.find(_.getLong(1) == 30L).get.getDouble(3)
    assert(p7 > 10.0 * p30)
  }

  test("turningPoints: integer sign-flip detection, z by hand") {
    val got = Breadth110.turningPoints(ev(Seq(100, 300, 200, 400)),
      "user_id", "ts", "value", "event_id").collect()(0)
    assert(got.getLong(1) === 4L && got.getLong(2) === 2L)
    val z = (2.0 - 2.0 * 2.0 / 3.0) / math.sqrt(35.0 / 90.0)
    assert(got.getDouble(3) === z)
  }
}
