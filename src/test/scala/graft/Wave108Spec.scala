package graft

import graft.queries.Breadth104
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the hundred-fifth wave (Breadth104 bands /
  * tail dependence / downside beta). */
class Wave108Spec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String, Double)]) =
    rows.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("percentileBands: rank-exact cross-sectional day bands") {
    // one day, closes 1..10 across keys → p10=1, p50=5, p90=9
    val e = ev((1 to 10).map(i =>
      (i.toLong, i.toLong, "2024-01-01 10:00:00", i.toDouble)))
    val r = Breadth104.percentileBands(e, "user_id", "ts", "value",
      "event_id").collect()(0)
    assert(r.getLong(1) === 10L)
    assert(r.getDouble(2) === 1.0 && r.getDouble(3) === 5.0 &&
      r.getDouble(4) === 9.0)
  }

  test("tailDependence: joint crash days over the decile cutoffs") {
    // keys 1,2 move identically over 10 move-days (cutoff = the single
    // worst move) → crash sets equal → jaccard 1.0
    val closes = Seq(100, 99, 98, 90, 95, 96, 97, 98, 99, 100, 101)
    val e = ev(for {
      k <- Seq(1L, 2L)
      (c, i) <- closes.zipWithIndex
    } yield (k, k * 100 + i.toLong, f"2024-01-${i + 1}%02d 10:00:00",
      c.toDouble))
    val got = Breadth104.tailDependence(e, "user_id", "ts", "value",
      "event_id").collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    assert(r.getLong(2) === r.getLong(3) && r.getLong(4) === r.getLong(2))
    assert(r.getDouble(5) === 1.0)
  }

  test("downsideBeta conditions the regression on market-down days") {
    // key 1 mirrors the market (x = m/2 with 2 keys); all-down days →
    // beta on the conditioned sample is exactly the OLS slope
    val e = ev(for {
      k <- Seq(1L, 2L)
      (c, i) <- Seq(100, 90, 85, 70).zipWithIndex
    } yield (k, k * 100 + i.toLong, f"2024-01-${i + 1}%02d 10:00:00",
      c.toDouble))
    val got = Breadth104.downsideBeta(e, "user_id", "ts", "value",
      "event_id").collect()
    // moves per key: −1000, −500, −1500 cents; m = double that
    // slope = (nΣxm − ΣxΣm)/(nΣmm − (Σm)²) with x = m/2 → 0.5
    assert(got.length === 2)
    assert(got(0).getLong(1) === 3L)
    assert(got(0).getDouble(2) === 0.5 && got(1).getDouble(2) === 0.5)
  }
}
