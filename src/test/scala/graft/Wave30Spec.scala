package graft

import graft.queries.Breadth30
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the thirtieth wave (Breadth30 stop-and-
  * reverse / normalized momentum / risk ratios). */
class Wave30Spec extends SparkSpec {
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

  test("psar: an uptrend never reverses (SAR stays below the lows, AF " +
    "steps on each new high); a crash through SAR flips the regime to " +
    "the prior extreme point") {
    // rising bars: (low, high) strictly climbing
    val up = Seq((100L, 110L), (105L, 120L), (112L, 130L), (118L, 140L))
    val gotUp = Breadth30.psar(ticks(hlSeries(up)),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("psar", "is_up")
      .as[(Double, Boolean)].collect().toSeq
    assert(gotUp.forall(_._2), "uptrend stays long")
    // hand fold pins the values
    var st: Option[Breadth30.PsarAcc] = None
    val want = up.map { case (lo, hi) =>
      st = Some(Breadth30.psarStep(st, hi, lo))
      (st.get.sar / 100.0, st.get.up)
    }
    assert(gotUp === want)
    // SAR stays strictly below every bar's low while long
    gotUp.zip(up).foreach { case ((s, _), (lo, _)) =>
      assert(s <= lo / 100.0)
    }
    // crash: two rising bars then a collapse through the SAR
    val crash = Seq((100L, 110L), (105L, 120L), (20L, 30L))
    val gotCr = Breadth30.psar(ticks(hlSeries(crash, key = 2L)),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("psar", "is_up")
      .as[(Double, Boolean)].collect().toSeq
    assert(gotCr(1)._2 === true)
    assert(gotCr(2)._2 === false, "collapse reverses the regime")
    // reversal SAR = the prior extreme point (the 120 high), price dom
    assert(gotCr(2)._1 === 1.2)
  }

  test("stochRsi: the rolling min/max normalization matches a hand " +
    "fold over the Wilder RSI series, stays in [0,100], and a bar at " +
    "the window extreme scores exactly 0 or 100") {
    // long alternation: enough bars for RSI warm-up (15) + window (14)
    val closes = (0 until 40).map(i => if (i % 2 == 0) 1000L else 1100L)
    val got = Breadth30.stochRsi(ticks(series(closes)),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("rsi_wilder", "stoch_rsi")
      .as[(Double, Option[Double])].collect().toSeq
    assert(got.nonEmpty)
    // recompute from the raw Wilder RSI series with a hand window
    val rsi = graft.queries.Breadth19.wilderRsiSeries(
      ticks(series(closes)), "user_id", "ts", "value", "event_id")
      .filter(col("rsi_wilder").isNotNull)
      .orderBy("day").select("rsi_wilder").as[Double].collect().toSeq
    val want = rsi.indices.drop(Breadth30.StochRsiW - 1).map { i =>
      val w = rsi.slice(i - (Breadth30.StochRsiW - 1), i + 1)
      val (mn, mx) = (w.min, w.max)
      (rsi(i), if (mx > mn) Some(100.0 * (rsi(i) - mn) / (mx - mn)) else None)
    }
    assert(got === want)
    got.flatMap(_._2).foreach(s => assert(s >= 0.0 && s <= 100.0))
    // the alternation guarantees some bars ARE the window extreme
    assert(got.exists(_._2.contains(0.0)) || got.exists(_._2.contains(100.0)))
  }

  test("cmo: a monotone rise pins CMO=100, a monotone fall -100, a " +
    "perfectly balanced alternation 0") {
    val rise = (0 until 20).map(i => 1000L + i * 10)
    val gotR = Breadth30.cmo(ticks(series(rise)),
      "user_id", "ts", "value", "event_id")
      .select("cmo").as[Option[Double]].collect().toSeq
    assert(gotR.nonEmpty && gotR.forall(_.contains(100.0)))
    val fall = (0 until 20).map(i => 2000L - i * 10)
    val gotF = Breadth30.cmo(ticks(series(fall, key = 2L)),
      "user_id", "ts", "value", "event_id")
      .select("cmo").as[Option[Double]].collect().toSeq
    assert(gotF.nonEmpty && gotF.forall(_.contains(-100.0)))
    val alt = (0 until 20).map(i => if (i % 2 == 0) 1000L else 1010L)
    val gotA = Breadth30.cmo(ticks(series(alt, key = 3L)),
      "user_id", "ts", "value", "event_id")
      .select("cmo").as[Option[Double]].collect().toSeq
    // 14 diffs alternate +10/−10 → ΣU = ΣD → CMO = 0
    assert(gotA.nonEmpty && gotA.forall(_.contains(0.0)))
  }

  test("sortino: an all-gain series is unscored (no downside); a known " +
    "mixed series matches the closed form") {
    val gains = Seq(1000L, 1010L, 1020L, 1030L)
    val gotG = Breadth30.sortino(ticks(series(gains)),
      "user_id", "ts", "value", "event_id")
      .select("n_days", "n_down", "sortino_daily")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(gotG === Seq((3L, 0L, None)))
    // moves: +10, −20, +30 → Σx=20, downside²=400, n=3
    val mixed = Seq(1000L, 1010L, 990L, 1020L)
    val gotM = Breadth30.sortino(ticks(series(mixed, key = 2L)),
      "user_id", "ts", "value", "event_id")
      .select("n_days", "n_down", "sortino_daily")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(gotM.length === 1)
    assert(gotM.head._1 === 3L && gotM.head._2 === 1L)
    assert(gotM.head._3.get === 20.0 / math.sqrt(3.0 * 400.0))
  }

  test("roc: a flat series pins ROC=0; a known move pins the ratio; " +
    "fewer than N+1 days yields no rows") {
    val flat = Seq.fill(13)(1200L)
    val gotF = Breadth30.roc(ticks(series(flat)),
      "user_id", "ts", "value", "event_id")
      .select("roc").as[Option[Double]].collect().toSeq
    assert(gotF.length === 3 && gotF.forall(_.contains(0.0)))
    val short = Seq.fill(10)(1200L)
    val gotS = Breadth30.roc(ticks(series(short, key = 2L)),
      "user_id", "ts", "value", "event_id")
      .collect()
    assert(gotS.isEmpty)
    // 11 days, last = first · 1.5 → ROC = 50
    val move = (0 until 11).map(i => 1000L + i * 50)
    val gotM = Breadth30.roc(ticks(series(move, key = 3L)),
      "user_id", "ts", "value", "event_id")
      .select("base_cents", "roc")
      .as[(Long, Option[Double])].collect().toSeq
    assert(gotM === Seq((1000L, Some(50.0))))
  }

  test("pivotPoints: a known prior bar pins all five levels; the first " +
    "day is dropped") {
    // day1 bar: low 90, high 120, close 120 (last tick wins)
    val t = ticks(Seq(
      (1L, 0.90, 1L, day(1)), (1L, 1.20, 2L, day(1)),
      (1L, 1.00, 3L, day(2))))
    val got = Breadth30.pivotPoints(t, "user_id", "ts", "value", "event_id")
      .select("day", "pivot", "r1", "s1", "r2", "s2")
      .as[(java.sql.Date, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got.length === 1)
    val p = (120.0 + 90.0 + 120.0) / 3.0 // cents
    assert(got.head._2 === p / 100.0)
    assert(got.head._3 === (2.0 * p - 90.0) / 100.0)
    assert(got.head._4 === (2.0 * p - 120.0) / 100.0)
    assert(got.head._5 === (p + 30.0) / 100.0)
    assert(got.head._6 === (p - 30.0) / 100.0)
  }
}
