package graft

import graft.queries.Breadth98
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the ninety-ninth wave (Breadth98
  * hypothesis tests). */
class Wave101Spec extends SparkSpec {
  import spark.implicits._

  test("welchT matches the hand-computed t and Welch df") {
    // A: 1.00, 2.00, 3.00 → cents 100,200,300; B: 5.00, 7.00
    val e = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0), ("b", 7.0))
      .toDF("event_type", "value")
    val r = Breadth98.welchT(e, "event_type", "value", "a", "b").collect()(0)
    val (na, sa, qa) = (3.0, 600.0, 140000.0)
    val (nb, sb, qb) = (2.0, 1200.0, 740000.0)
    val va = (na * qa - sa * sa) / (na * (na - 1))
    val vb = (nb * qb - sb * sb) / (nb * (nb - 1))
    val (sea, seb) = (va / na, vb / nb)
    val t = (sa / na - sb / nb) / math.sqrt(sea + seb)
    val dfW = (sea + seb) * (sea + seb) /
      (sea * sea / (na - 1) + seb * seb / (nb - 1))
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === (sa / na - sb / nb) / 100.0)
    assert(r.getDouble(3) === t)
    assert(r.getDouble(4) === dfW)
  }

  test("leveneBF: medians exact for odd and even groups, F by hand") {
    // g1: 1,2,3 (med 2) → z2 = |2c−2·200| = 200,0,200
    // g2: 1,3 (med 2) → z2 = 200,200
    val e = Seq(("g1", 1.0), ("g1", 2.0), ("g1", 3.0), ("g2", 1.0),
      ("g2", 3.0)).toDF("event_type", "value")
    val r = Breadth98.leveneBF(e, "event_type", "value").collect()(0)
    // z-groups: g1 {200,0,200} s=400 q=80000 n=3; g2 {200,200} s=400
    // q=80000 n=2; sb = 400²/3 + 400²/2 = 133333.33…; grand = 800²/5
    val sb = 400.0 * 400.0 / 3.0 + 400.0 * 400.0 / 2.0
    val grand = 800.0 * 800.0 / 5.0
    val f = ((sb - grand) / 1.0) / ((160000.0 - sb) / 3.0)
    assert(r.getLong(0) === 5L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === f)
  }

  test("grubbs: max deviation studentized, n-scaled integer numerator") {
    // one group: 1.00, 2.00, 6.00 → mean 300, max|c·3 − 900| = 900
    val e = Seq(("g", 1.0), ("g", 2.0), ("g", 6.0))
      .toDF("event_type", "value")
    val r = Breadth98.grubbs(e, "event_type", "value").collect()(0)
    val (n, s, q) = (3.0, 900.0, 410000.0)
    val sd = math.sqrt((n * q - s * s) / (n * (n - 1)))
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 3.0)
    assert(r.getDouble(3) === (900.0 / 3.0) / sd)
  }

  test("chatterjeeXi is 1-ish for monotone and ~0 for zigzag series") {
    // key 1: perfectly increasing 5 points → S = n−1 = 4, l(n−l) terms
    // for distinct values: l = 5,4,3,2,1 → Σ l(5−l) = 0+4+6+6+4 = 20
    // ξ = 1 − 5·4/(2·20) = 0.5 (the small-n exact value)
    val e = (1 to 5).map(i => (1L, i.toLong, f"2024-01-0$i 10:00:00",
      i.toDouble)).toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val r = Breadth98.chatterjeeXi(e, "user_id", "ts", "value", "event_id")
      .collect()(0)
    assert(r.getLong(1) === 5L)
    assert(r.getDouble(2) === 1.0 - 5.0 * 4.0 / (2.0 * 20.0))
  }

  test("wilcoxonSigned: doubled tie-averaged ranks over day moves") {
    // 3 key-days with moves +1.00, −1.00, +3.00 (|d| ties at 100):
    // ranks of |d|: {100:1.5, 100:1.5, 300:3} doubled: 3,3,6
    // W+ = (3 + 6)/2 = 4.5; n=3; μ=3; σ² = 3·4·7/24 − (2³−2)/48 = 3.375
    val e = Seq(
      (1L, 0L, "2024-01-01 09:00:00", 1.00), (1L, 1L, "2024-01-01 17:00:00", 2.00),
      (2L, 2L, "2024-01-01 09:00:00", 5.00), (2L, 3L, "2024-01-01 17:00:00", 4.00),
      (3L, 4L, "2024-01-01 09:00:00", 1.00), (3L, 5L, "2024-01-01 17:00:00", 4.00))
      .toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val r = Breadth98.wilcoxonSigned(e, "user_id", "ts", "value",
      "event_id").collect()(0)
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) === 4.5)
    val z = (4.5 - 3.0) / math.sqrt(3.0 * 4.0 * 7.0 / 24.0 - 6.0 / 48.0)
    assert(r.getDouble(2) === z)
  }
}
