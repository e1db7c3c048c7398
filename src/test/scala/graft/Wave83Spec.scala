package graft

import graft.queries.Breadth80
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the eighty-first wave (Breadth80 signal IC
  * / volume-move correlation / order fill span). */
class Wave83Spec extends SparkSpec {
  import spark.implicits._

  private def eventsOfCloses(user: Long, closes: Seq[Double]) =
    closes.zipWithIndex.map { case (v, i) =>
      (user, user * 100 + i, f"2024-01-${i + 1}%02d 10:00:00", v)
    }.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("signalIc: a momentum-continuation panel scores a positive " +
    "pooled IC computed by hand") {
    // two keys, three days of moves each; signal = prev move.
    // key1 moves: +1, +2, +3; key2: -1, -2, -3 -> perfect continuation
    val e = eventsOfCloses(1L, Seq(1.00, 1.01, 1.03, 1.06))
      .unionAll(eventsOfCloses(2L, Seq(2.00, 1.99, 1.97, 1.94)))
    val r = Breadth80.signalIc(e, "user_id", "ts", "value", "event_id")
      .collect()(0)
    // pairs exist on days 3,4 (signal = prev move): each day the
    // ranks are (1,1) for key2 and (2,2) for key1 -> perfect corr
    assert(r.getLong(0) === 4L)
    // n=4 sx=sy=6 sxy=10 sxx=syy=10 -> r = (40-36)/(sqrt(4)*sqrt(4))
    assert(r.getDouble(1) === 4.0 / (math.sqrt(4.0) * math.sqrt(4.0)))
  }

  test("volumeMoveCorr: hand panel where volume tracks |move| exactly") {
    // |moves| 1,2,3 with vols 10,20,30 -> perfect correlation
    val moves = Seq(1, -2, 3)
    val closes = moves.scanLeft(100)(_ + _).map(_ / 100.0)
    val e = closes.zipWithIndex.map { case (v, i) =>
      val vol = if (i == 0) 5 else math.abs(moves(i - 1)) * 10
      (1L, i.toLong, f"2024-01-${i + 1}%02d 10:00:00", v,
        s"""{"k":$vol}""")
    }.toDF("user_id", "event_id", "at", "value", "props")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val r = Breadth80.volumeMoveCorr(e, "user_id", "ts", "value",
        "event_id", "k")
      .collect()(0)
    assert(r.getLong(1) === 3L)
    // x=(1,2,3) v=(10,20,30): n=3 sx=6 sy=60 sxy=140 sxx=14 syy=1400
    val num = 3.0 * 140 - 6 * 60
    val want = num / (math.sqrt(3.0 * 14 - 36) * math.sqrt(3.0 * 1400 - 3600))
    assert(r.getDouble(2) === want)
  }

  test("orderFillSpan: spans per order roll up per priority") {
    val orders = Seq((1L, "1-URGENT"), (2L, "1-URGENT"), (3L, "5-LOW"))
      .toDF("o_orderkey", "o_orderpriority")
    val li = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-05"),
      (2L, "2024-02-01"),
      (3L, "2024-03-01"), (3L, "2024-03-02"), (3L, "2024-03-11"))
      .toDF("l_orderkey", "at")
      .withColumn("l_shipdate", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth80.orderFillSpan(orders, li)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(got === Seq(
      ("1-URGENT", 2L, 3L, 2.0, 4L), // spans 4 and 0
      ("5-LOW", 1L, 3L, 10.0, 10L)))
  }
}
