package graft

import graft.queries.Breadth29
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the twenty-ninth wave (Breadth29 volatility
  * estimators + concentration). */
class Wave29Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long, String, Long)]) =
    rows.toDF("user_id", "value", "event_id", "at", "k")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", concat(lit("{\"k\":"), col("k"), lit("}")))
      .drop("k")

  private def day(i: Int) = f"2024-01-$i%02d 10:00:00"

  test("parkinson: flat bars score exactly 0; a constant-ratio series " +
    "pins the closed form sqrt(q/1e12/(4 ln2 n))") {
    // key 1: single-tick days -> H = L -> ln = 0 -> sigma 0
    val flat = (1 to 4).map(i => (1L, 10.0, i.toLong, day(i), 2L))
    // key 2: every day low 10.00 high 20.00 (close=low ordering: ticks
    // high first then low) -> ln(2)^2 per bar
    val ratio = (1 to 4).flatMap { d =>
      Seq((2L, 20.0, 100L + d * 10 + 1, day(d), 3L),
        (2L, 10.0, 100L + d * 10 + 2, day(d), 3L))
    }
    val got = Breadth29.parkinson(ticks(flat ++ ratio), "user_id", "ts",
      "value", "event_id", "k")
      .orderBy("user_id").select("user_id", "n_days", "sigma_p")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got(0) === ((1L, 4L, 0.0)))
    // 4 identical ln(2)^2 terms -> sigma = sqrt(ln(2)^2/(4 ln 2)) rounded
    val t = math.log(2.0) * math.log(2.0)
    val want = BigDecimal.decimal(
      math.sqrt((((t + t) + t) + t) / (4.0 * math.log(2.0) * 4L)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1) === ((2L, 4L, want)))
  }

  test("garmanKlass: a body-less bar (open = close) reduces to the pure " +
    "range term, and zero-price bars are excluded") {
    // open 10, high 20, low 10, close 10 -> body ln(C/O) = 0 ->
    // gq = floor(1e12 * 0.5 ln(2)^2)
    val bars = (1 to 3).flatMap { d =>
      Seq((1L, 10.0, d * 10L + 1, day(d), 1L),
        (1L, 20.0, d * 10L + 2, day(d), 1L),
        (1L, 10.0, d * 10L + 3, day(d), 1L))
    }
    // key 2: one zero-price day (excluded) + one normal day
    val zp = Seq((2L, 0.0, 900L, day(1), 1L), (2L, 10.0, 901L, day(2), 1L))
    val got = Breadth29.garmanKlass(ticks(bars ++ zp), "user_id", "ts",
      "value", "event_id", "k")
      .orderBy("user_id").select("user_id", "n_days", "sigma_gk")
      .as[(Long, Long, Option[Double])].collect().toSeq
    val g = 0.5 * math.log(2.0) * math.log(2.0)
    val want = BigDecimal.decimal(math.sqrt(((g + g) + g) / 3L))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) === ((1L, 3L, Some(want))))
    assert(got(1) === ((2L, 1L, Some(0.0)))) // only the flat day scored
  }

  test("kyleLambda: impact proportional to volume pins the exact slope, " +
    "constant volume is unscored (zero variance)") {
    // key 1: |dclose| = 2 * v exactly -> lambda = 2
    // closes 1000, 1020, 1080, 1090 ; vols on days 2..4: 10, 30, 5
    val rows = Seq((1000L, 7L), (1020L, 10L), (1080L, 30L), (1090L, 5L))
      .zipWithIndex.map { case ((c, v), i) =>
        (1L, c.toDouble / 100.0, i.toLong + 1, day(i + 1), v) }
    // key 2: constant volume -> den = 0 -> unscored
    val const = Seq((1000L, 5L), (1100L, 5L), (1050L, 5L)).zipWithIndex
      .map { case ((c, v), i) =>
        (2L, c.toDouble / 100.0, 100L + i, day(i + 1), v) }
    val got = Breadth29.kyleLambda(ticks(rows ++ const), "user_id", "ts",
      "value", "event_id", "k")
      .orderBy("user_id").select("user_id", "n_days", "kyle_lambda")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got(0) === ((1L, 3L, Some(2.0))))
    assert(got(1) === ((2L, 2L, None)))
  }

  test("herfindahl: equal shares pin HHI = 1/n and normalized 0; a " +
    "monopolist pins both at 1") {
    val eq = (1 to 4).map(k =>
      (k.toLong, 10.0, k.toLong, day(k), 25L))
    val gotEq = Breadth29.herfindahl(ticks(eq), "user_id", "ts", "k")
      .as[(Long, Long, Double, Option[Double])].collect().head
    assert(gotEq === ((4L, 100L, 0.25, Some(0.0))))
    val mono = Seq((9L, 10.0, 900L, day(1), 60L))
    val gotM = Breadth29.herfindahl(ticks(mono), "user_id", "ts", "k")
      .as[(Long, Long, Double, Option[Double])].collect().head
    assert(gotM === ((1L, 60L, 1.0, None))) // n = 1: normalized undefined
  }
}
