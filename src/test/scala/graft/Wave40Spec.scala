package graft

import graft.queries.Breadth40
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the fortieth wave (Breadth40 participation
  * + dispersion). */
class Wave40Spec extends SparkSpec {
  import spark.implicits._

  private def day(i: Int) =
    java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1).toString + " 10:00:00"

  private def ticks(rows: Seq[(Long, Long, Int)]) =
    rows.zipWithIndex.map { case ((k, c, d), i) =>
      (k, c.toDouble / 100.0, i.toLong + 1, day(d))
    }.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", lit("{}"))

  test("pctAboveMa: a rising key is always above its mean, a falling " +
    "key never, a flat key never (strict inequality) — share = 1/3") {
    val rows = (0 until 25).flatMap(i => Seq(
      (1L, 1000L + i * 10, i + 1),  // rising: close > mean
      (2L, 5000L - i * 10, i + 1),  // falling: close < mean
      (3L, 3000L, i + 1)))          // flat: close == mean -> not above
    val got = Breadth40.pctAboveMa(ticks(rows),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("n_scored", "n_above", "pct_above")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.size === 25 - 19)
    assert(got.forall(_ === ((3L, 1L, 1.0 / 3.0))))
  }

  test("dispersion: identical same-day moves across keys score 0; a " +
    "known split pins the exact sigma") {
    val sync = (0 until 5).flatMap(i => Seq(
      (1L, 1000L + i * 10, i + 1), (2L, 2000L + i * 10, i + 1)))
    val gotS = Breadth40.dispersion(ticks(sync),
      "user_id", "ts", "value", "event_id")
      .select("dispersion_cents").as[Double].collect().toSeq
    assert(gotS.nonEmpty && gotS.forall(_ === 0.0))
    // one day, moves +10 and −10: n=2, Σx=0, Σx²=200 → σ = √400/2 = 10
    val split = Seq((1L, 1000L, 1), (2L, 2000L, 1),
      (1L, 1010L, 2), (2L, 1990L, 2))
    val gotD = Breadth40.dispersion(ticks(split),
      "user_id", "ts", "value", "event_id")
      .select("n_keys", "dispersion_cents")
      .as[(Long, Double)].collect().toSeq
    assert(gotD === Seq((2L, 10.0)))
  }
}
