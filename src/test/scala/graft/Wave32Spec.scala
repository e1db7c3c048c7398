package graft

import graft.queries.Breadth32
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the thirty-second wave (Breadth32
  * tolerance as-of, choppiness, Fisher transform, perplexity gate). */
class Wave32Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long, String)]) =
    rows.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", lit("{}"))

  private def day(i: Int) =
    java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1).toString + " 10:00:00"

  private def series(closes: Seq[Long], key: Long = 1L) =
    closes.zipWithIndex.map { case (c, i) =>
      (key, c.toDouble / 100.0, i.toLong + 1, day(i + 1))
    }

  /** Two ticks per day → a real high/low spread: (low, high) pairs. */
  private def hlSeries(bars: Seq[(Long, Long)], key: Long = 1L) =
    bars.zipWithIndex.flatMap { case ((lo, hi), i) =>
      Seq((key, lo.toDouble / 100.0, i.toLong * 2 + 1, day(i + 1)),
        (key, hi.toDouble / 100.0, i.toLong * 2 + 2, day(i + 1)))
    }

  test("choppiness: a max-trend series (each bar's range IS the true " +
    "range, disjoint spans) scores log(sum/range) of a telescoping " +
    "window; a one-bar-range sideways series pins chop = 100") {
    // sideways: every bar identical (50, 60) -> TR = 10 each (no gap),
    // 14-bar sum = 140, window range = 10 -> chop = 100·log10(14)/log10(14)
    val side = Seq.fill(16)((5000L, 6000L))
    val gotS = Breadth32.choppiness(ticks(hlSeries(side)),
      "user_id", "ts", "value", "event_id")
      .select("chop").as[Option[Double]].collect().toSeq
    assert(gotS.nonEmpty && gotS.forall(_.contains(100.0)))
    // strict staircase: bar i spans exactly [i·10, i·10+10] with no
    // overlap and no gap -> TR = 10 every bar, window range = 14·10
    // -> chop = 100·log10(140/140)/log10(14) = 0
    val stairs = (0 until 16).map(i => (1000L + i * 10, 1000L + i * 10 + 10))
    val gotT = Breadth32.choppiness(ticks(hlSeries(stairs, key = 2L)),
      "user_id", "ts", "value", "event_id")
      .select("chop").as[Option[Double]].collect().toSeq
    assert(gotT.nonEmpty && gotT.forall(_.contains(0.0)))
  }

  test("fisher: warm-up bars drop; the hand fold pins a moving series " +
    "and the clamp engages on an extreme range exit") {
    val bars = (0 until 16).map { i =>
      val base = 1000L + (i % 5) * 37 + i * 3
      (base - 20, base + 25)
    }
    val closes = bars.map(_._2) // close = high (last tick wins)
    val got = Breadth32.fisher(ticks(hlSeries(bars)),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("fisher_v", "fisher")
      .as[(Double, Double)].collect().toSeq
    var st: Option[Breadth32.FisherAcc] = None
    val want = bars.zip(closes).flatMap { case ((lo, hi), c) =>
      val a = Breadth32.fisherStep(st, c, hi, lo)
      st = Some(a)
      // the emitted fisher rounds to 6 dp (Spark round = HALF_UP over
      // the shortest decimal repr — BigDecimal.valueOf semantics)
      if (a.live) Some((a.v, BigDecimal.valueOf(a.fish)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      else None
    }
    assert(got === want)
    assert(got.size === 16 - (Breadth32.FisherW - 1))
    // close at the window max every bar -> raw = 1 -> v ratchets up;
    // it must stay within the clamp
    got.foreach { case (v, _) => assert(v >= -0.999 && v <= 0.999) }
  }

  test("fisher clamp: a close pinned at the rising window max drives v " +
    "toward +0.999 and never past it") {
    // strongly trending: raw = 1 every full window
    val bars = (0 until 30).map(i => (1000L + i * 100, 1100L + i * 100))
    val got = Breadth32.fisher(ticks(hlSeries(bars)),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("fisher_v").as[Double].collect().toSeq
    assert(got.last <= 0.999 && got.last > 0.9)
    assert(got.forall(_ <= 0.999))
  }

  test("pplGate: ranks at the 90th percentile keep the low-perplexity " +
    "docs, drop the top decile, and agree with the scoring rung") {
    val got = Breadth32.pplGate(spark, "/root/testdata/sf0.001")
      .select("doc_id", "ppl", "ppl_rank", "n_docs", "keep")
      .as[(Long, Double, Long, Long, Boolean)].collect().toSeq
    assert(got.nonEmpty)
    val n = got.head._4
    assert(got.forall(_._4 === n) && n === got.size)
    val kept = got.count(_._5)
    assert(kept === math.ceil(0.9 * n).toLong)
    // the kept set is exactly the lowest-ranked 90%
    got.foreach { case (_, _, r, nd, k) =>
      assert(k === (r <= math.ceil(0.9 * nd).toLong))
    }
    // rank order agrees with ppl order (ties by doc_id)
    val byRank = got.sortBy(_._3)
    byRank.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a._2 < b._2 || (a._2 == b._2 && a._1 < b._1))
      case _ =>
    }
  }
}
