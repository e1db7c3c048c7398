package graft

import graft.queries.Breadth72
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the seventy-third wave (Breadth72 XCF /
  * Hill tail index / gap fill). */
class Wave74Spec extends SparkSpec {
  import spark.implicits._

  private def eventsOf(rows: Seq[(Long, Long, String, Double)]) =
    rows.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  private def eventsOfCloses(user: Long, closes: Seq[Double]) =
    eventsOf(closes.zipWithIndex.map { case (v, i) =>
      (user, user * 100 + i, f"2024-01-${i + 1}%02d 10:00:00", v)
    })

  test("xcf: a single-key market reproduces the hand Pearson at each " +
    "lag; the one-pair lag is unscored") {
    val e = eventsOfCloses(1L, Seq(1.00, 1.01, 1.03, 1.12, 1.09))
    // moves: 1, 2, 9, -3; market == own moves (single key)
    val xs = Seq(1L, 2L, 9L, -3L)
    def pearson(pairs: Seq[(Long, Long)]): Option[Double] = {
      val n = pairs.size
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      if (vx > 0 && vy > 0)
        Some((n * sxy - sx * sy).toDouble /
          (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble)))
      else None
    }
    val got = Breadth72.xcf(e, "user_id", "ts", "value", "event_id")
      .collect().map(r => (r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    val want = (0 to 3).map { l =>
      val pairs = (l until xs.size).map(t => (xs(t), xs(t - l)))
      (l, pairs.size.toLong, pearson(pairs))
    }
    assert(got === want)
    assert(got(0)._3.get > 0.999999) // lag-0 self-correlation ~ 1
    assert(got(3)._3 === None)       // single pair -> zero variance
  }

  test("hillTail: k=3 hand value; a key without k+1 nonzero moves is " +
    "absent") {
    // moves: +9, -7, +5, -4, +2 (5 nonzero) for key 1; key 2 flat
    val e = eventsOfCloses(1L, Seq(1.00, 1.09, 1.02, 1.07, 1.03, 1.05))
      .unionAll(eventsOfCloses(2L, Seq(2.00, 2.00, 2.00)))
    val got = Breadth72.hillTail(e, "user_id", "ts", "value", "event_id",
        k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .toSeq
    def q(a: Long) = math.floor(
      math.log(a.toDouble / 4.0) * 1.0e6 + 0.5).toLong
    val want = 3 * 1.0e6 / (q(9) + q(7) + q(5)).toDouble
    assert(got === Seq((1L, 3, want)))
  }

  test("gapFill: up-gap fills at the first later low touching the " +
    "prior high; unfilled gap stays null") {
    // two ticks/day: (open, close); day bars:
    // d1 (100,110) -> d2 gap-up open 120 (ph=110), low 115
    // d3 low 108 <= 110 -> fills d2's gap; d3 itself: open 112 < ph?
    //   ph(d3)=high(d2)=120 -> open 112 < 120, and pl(d3)=low(d2)=115 ->
    //   open 112 < 115 -> gap DOWN at d3 (thr 115, gap 3); filled when a
    //   later high >= 115 -> d4 high 113 no, none -> null
    val rows = Seq(
      (1, 100, 110), (2, 120, 115), (3, 112, 108), (4, 113, 109))
    val e = eventsOf(rows.flatMap { case (d, o, c) =>
      Seq((1L, d.toLong * 10, f"2024-01-$d%02d 09:00:00", o / 100.0),
        (1L, d.toLong * 10 + 1, f"2024-01-$d%02d 16:00:00", c / 100.0))
    })
    val got = Breadth72.gapFill(e, "user_id", "ts", "value", "event_id")
      .collect().map(r => (r.getDate(1).toString, r.getInt(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDate(4).toString),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    // d4 also gaps up: ph(d4) = high(d3) = 112 < open 113, never filled
    assert(got === Seq(
      ("2024-01-02", 1, 10L, Some("2024-01-03"), Some(1L)),
      ("2024-01-03", -1, 3L, None, None),
      ("2024-01-04", 1, 1L, None, None)))
  }
}
