package graft

import graft.queries.Breadth88
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the eighty-ninth wave (Breadth88 STL-lite
  * decomposition / changepoint / 2x2 PCA). */
class Wave91Spec extends SparkSpec {
  import spark.implicits._

  private def eventsOfCloses(user: Long, closes: Seq[Double],
                             props: Seq[String] = Seq.empty) =
    closes.zipWithIndex.map { case (v, i) =>
      (user, user * 100 + i, f"2024-01-${i + 1}%02d 10:00:00", v,
        if (props.isEmpty) """{"k":0}""" else props(i))
    }.toDF("user_id", "event_id", "at", "value", "props")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("stlDecomp: a single spike decomposes into the exact trend and " +
    "weekday seasonal with zero residual at n=1 per weekday") {
    // cents 1,1,1,8,1,1,1,1,1,1: full 7-windows center days 4..7,
    // every s7 = 14 -> trend 2.0; det7 = 42,-7,-7,-7
    val closes = Seq(0.01, 0.01, 0.01, 0.08, 0.01, 0.01, 0.01, 0.01,
      0.01, 0.01)
    val got = Breadth88.stlDecomp(eventsOfCloses(1L, closes),
        "user_id", "ts", "value", "event_id")
      .collect().map(r => (r.getDate(1).toString, r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got === Seq(
      ("2024-01-04", 2.0, 6.0, 0.0),
      ("2024-01-05", 2.0, -1.0, 0.0),
      ("2024-01-06", 2.0, -1.0, 0.0),
      ("2024-01-07", 2.0, -1.0, 0.0)))
  }

  test("changepoint: a clean level shift splits exactly at the step") {
    val closes = Seq.fill(5)(1.00) ++ Seq.fill(5)(2.00)
    val r = Breadth88.changepoint(eventsOfCloses(1L, closes),
        "user_id", "ts", "value", "event_id").collect()(0)
    assert(r.getDate(1).toString === "2024-01-05")
    assert(r.getLong(2) === 5L && r.getLong(3) === 5L)
    assert(r.getDouble(4) === 100.0 && r.getDouble(5) === 200.0)
  }

  test("pca2: perfectly correlated move/volume collapses to one " +
    "component with the hand eigensystem") {
    // moves 1,2,3; vols 2,4,6 -> a=2/3 c=8/3 b=4/3, disc=10/3
    val closes = Seq(1.00, 1.01, 1.03, 1.06)
    val props = Seq("""{"k":0}""", """{"k":2}""", """{"k":4}""",
      """{"k":6}""")
    val r = Breadth88.pca2(eventsOfCloses(1L, closes, props),
        "user_id", "ts", "value", "event_id", "k").collect()(0)
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 0.666667) // var_x
    assert(r.getDouble(3) === 2.666667) // var_y
    assert(r.getDouble(4) === 1.333333) // cov
    assert(r.getDouble(5) === 3.333333) // lambda1
    assert(r.getDouble(6) === 0.0)      // lambda2
    assert(r.getDouble(7) === 1.0)      // evr1
    assert(r.getDouble(8) === BigDecimal(math.atan2(8.0 / 3.0, 4.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
