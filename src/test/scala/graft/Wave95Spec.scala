package graft

import graft.queries.Breadth92
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the ninety-third wave (Breadth92 Coppock /
  * KST / chandelier). */
class Wave95Spec extends SparkSpec {
  import spark.implicits._

  private def ramp(user: Long, n: Int) =
    (1 to n).map(i => (user, user * 1000 + i,
      f"2024-${(i - 1) / 28 + 1}%02d-${(i - 1) % 28 + 1}%02d 10:00:00",
      i / 100.0))
      .toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("coppock: a linear cent ramp pins the curve at the constant " +
    "hand value from the first full lag stack") {
    // roc14 = 14, roc11 = 11 -> csum 25 -> WMA = 25
    val got = Breadth92.coppock(ramp(1L, 30), "user_id", "ts", "value",
        "event_id")
      .collect().map(_.getDouble(2)).toSeq
    assert(got.size === 7) // rows 24..30
    assert(got.forall(_ === 25.0))
  }

  test("kst: the ramp pins KST at 64 with the signal joining once " +
    "four KST bars exist") {
    // r4/r5/r6/r8 = 4/5/6/8 -> kst12 = 3*16+6*20+9*24+8*48 = 768
    val got = Breadth92.kst(ramp(1L, 30), "user_id", "ts", "value",
        "event_id")
      .collect().map(r => (r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got.size === 17) // rows 14..30
    assert(got.forall(_._1 === 64.0))
    assert(got.take(3).forall(_._2.isEmpty)) // rows 14..16
    assert(got.drop(3).forall(_._2 === Some(64.0))) // rows 17..30
  }

  test("chandelier: hand TR sums give exact long/short stops") {
    val closes = Seq(1.00, 1.10, 1.05, 1.20)
    val e = closes.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong, f"2024-01-${i + 1}%02d 10:00:00", v)
    }.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth92.chandelier(e, "user_id", "ts", "value",
        "event_id", w = 3)
      .collect().map(r => (r.getDate(1).toString, r.getDouble(2),
        r.getDouble(3))).toSeq
    // TRs 0,10,5,15; rn3: hh 110 ll 100 str 15; rn4: hh 120 ll 105 str 30
    assert(got === Seq(
      ("2024-01-03", 0.95, 1.15),
      ("2024-01-04", 0.90, 1.35)))
  }
}
