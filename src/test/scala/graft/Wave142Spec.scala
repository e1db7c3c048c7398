package graft

import graft.queries.Breadth134
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-thirty-fifth wave (Breadth134 CUPED). */
class Wave142Spec extends SparkSpec {
  import spark.implicits._

  /** Events for one key: closes from per-day moves, two days per move
    * so pre/post halves split cleanly. */
  private def keyEvents(key: Long, moves: Seq[Long]) = {
    val closes = moves.scanLeft(10000L + key)(_ + _)
    closes.zipWithIndex.map { case (c, i) =>
      (key, key * 1000 + i, f"2024-01-${i + 1}%02d 10:00:00",
        c.toDouble / 100.0) }
  }

  test("cuped: perfectly correlated pre/post halves reduce variance " +
    "to ~zero; theta recovers the slope") {
    // user u's pre-half mean move = u·10, post-half = 2·(u·10):
    // Y = 2X exactly → θ = 2, adjusted variance ~ 0
    val rows = (1L to 6L).flatMap { u =>
      keyEvents(u, Seq.fill(4)(u * 10L) ++ Seq.fill(4)(u * 20L))
    }
    val e = rows.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val r = Breadth134.cuped(e, "user_id", "ts", "value", "event_id")
      .collect()(0)
    assert(r.getLong(0) === 6L)
    assert(math.abs(r.getDouble(1) - 2.0) < 1e-9)        // theta
    assert(r.getDouble(4) > 0.999)                       // var_reduction
  }

  test("cuped: pre-independent post leaves variance essentially " +
    "untouched") {
    // post moves constant across users → var_y = 0 edge is degenerate;
    // instead make post vary independently of pre: post = +10/-10 by
    // user parity while pre varies by magnitude
    val rows = (1L to 6L).flatMap { u =>
      val post = if (u % 2 == 0) 10L else -10L
      keyEvents(u, Seq.fill(4)(u * 7L) ++ Seq.fill(4)(post))
    }
    val e = rows.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val r = Breadth134.cuped(e, "user_id", "ts", "value", "event_id")
      .collect()(0)
    // odd/even alternation is nearly orthogonal to the monotone pre —
    // CUPED can't remove much
    assert(r.getDouble(4) < 0.2)
    assert(r.getDouble(3) > 0.0)
  }
}
