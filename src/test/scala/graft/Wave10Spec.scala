package graft

import graft.queries.{Breadth10, Extensions9}
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the tenth wave (Breadth10 price-series
  * analytics + Extensions9 statistical screens): every assertion is
  * hand-computable from the fixture, independent of the DuckDB oracle. */
class Wave10Spec extends SparkSpec {
  import spark.implicits._

  /** Tick fixture: (user_id, value, event_id); ts = minute(event_id). */
  private def ticks(rows: Seq[(Long, Double, Long)]) =
    rows.toDF("user_id", "value", "event_id")
      .withColumn("ts", to_timestamp_ntz(
        concat(lit("2024-01-01 00:"), format_string("%02d", col("event_id")), lit(":00"))))

  test("drawdown: running peak, worst trough, unscored zero-peak prefix") {
    // series 10, 12, 6, 9, 3: peaks 10,12,12,12,12; dd 0,0,.5,.25,.75
    val dd = Breadth10.drawdownRows(
      ticks(Seq((1L, 10.0, 1L), (1L, 12.0, 2L), (1L, 6.0, 3L),
        (1L, 9.0, 4L), (1L, 3.0, 5L))),
      "user_id", "value", Seq(col("ts").asc, col("event_id").asc))
    val rows = dd.orderBy("event_id").select("__peak", "__dd")
      .as[(Double, Double)].collect()
    assert(rows.map(_._1).toSeq === Seq(10.0, 12.0, 12.0, 12.0, 12.0))
    assert(rows.map(_._2).toSeq === Seq(0.0, 0.0, 0.5, 0.25, 0.75))
    // a zero-value prefix has peak 0 -> unscored (null), not a div-by-zero
    val z = Breadth10.drawdownRows(
      ticks(Seq((2L, 0.0, 1L), (2L, 4.0, 2L))),
      "user_id", "value", Seq(col("ts").asc, col("event_id").asc))
      .orderBy("event_id").select("__dd").as[Option[Double]].collect()
    assert(z.toSeq === Seq(None, Some(0.0)))
  }

  test("rsi: all-gain pins 100, all-loss pins 0, balanced pins 50") {
    // 15 ticks ascending -> 14 gains, zero losses -> RSI 100 at row 15
    val up = Breadth10.rsi(
      ticks((1L to 15L).map(i => (1L, i.toDouble, i))),
      "user_id", "value", Seq(col("ts").asc, col("event_id").asc), period = 14)
    assert(up.select("rsi").as[Double].collect().toSeq === Seq(100.0))
    // descending -> RSI 0
    val down = Breadth10.rsi(
      ticks((1L to 15L).map(i => (1L, (30 - i).toDouble, i))),
      "user_id", "value", Seq(col("ts").asc, col("event_id").asc), period = 14)
    assert(down.select("rsi").as[Double].collect().toSeq === Seq(0.0))
    // alternating +1/-1 (14 diffs: 7 gains, 7 losses) -> RSI 50
    val flat = Breadth10.rsi(
      ticks((1L to 15L).map(i => (1L, (if (i % 2 == 0) 2.0 else 1.0), i))),
      "user_id", "value", Seq(col("ts").asc, col("event_id").asc), period = 14)
    assert(flat.select("rsi").as[Double].collect().toSeq === Seq(50.0))
  }

  test("sma crossover: scored only from the 7th row; golden cross flagged once") {
    // 10,9,8,7,6,5,4 declining, then 10,20,30: fast crosses above slow at row 9
    val vals = Seq(10.0, 9.0, 8.0, 7.0, 6.0, 5.0, 4.0, 10.0, 20.0, 30.0)
    val df = Breadth10.smaSignal(
      ticks(vals.zipWithIndex.map { case (v, i) => (1L, v, (i + 1).toLong) }),
      "user_id", "value", Seq(col("ts").asc, col("event_id").asc), fast = 3, slow = 7)
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val got = df.withColumn("crossed",
        col("signal") && (lag(col("signal"), 1).over(ord) <=> lit(false)))
      .orderBy("event_id")
      .select("event_id", "sma_fast", "sma_slow", "signal", "crossed")
      .as[(Long, Double, Double, Boolean, Boolean)].collect()
    assert(got.map(_._1).toSeq === Seq(7L, 8L, 9L, 10L))
    assert(got.map(_._4).toSeq === Seq(false, false, true, true))
    assert(got.map(_._5).toSeq === Seq(false, false, true, false))
    assert(got(0)._2 === 5.0)      // sma3 over 6,5,4
    assert(got(2)._3 === 8.5714)   // sma7 over 8..4,10,20 = 60/7
  }

  test("day gaps: prior close vs next open; first day unscored") {
    // day1: open 10, close 20; day2: open 30, close 15 -> gap +50%
    val df = Seq(
      (1L, "2024-01-01 09:00:00", 10.0, 1L), (1L, "2024-01-01 16:00:00", 20.0, 2L),
      (1L, "2024-01-02 09:00:00", 30.0, 3L), (1L, "2024-01-02 16:00:00", 15.0, 4L))
      .toDF("user_id", "t", "value", "event_id")
      .select(col("user_id"), to_timestamp_ntz(col("t")).as("ts"),
        col("value"), col("event_id"))
    val got = Breadth10.dayGaps(df, "user_id", "value")
      .select("open", "close", "prev_close", "gap_pct")
      .as[(Double, Double, Double, Double)].collect()
    assert(got.toSeq === Seq((30.0, 15.0, 20.0, 50.0)))
  }

  test("benford first digit: integer extraction is ulp-immune at boundaries") {
    val got = Seq(123.45, 999.995, 0.05, 6012.30, 1.0)
      .toDF("x").select(Extensions9.firstDigit(col("x")).as("d"))
      .as[Int].collect().toSeq
    // 999.995*100 stays below 100000 (stored double is 999.99499...),
    // so truncation keeps the leading 9 in BOTH engines
    assert(got === Seq(1, 9, 5, 6, 1))
  }

  test("lag-1 autocorrelation: linear +1, alternating -1") {
    val lin = Extensions9.lag1Autocorr(
      ticks((1L to 5L).map(i => (1L, i.toDouble, i))),
      "user_id", "value", Seq(col("ts").asc, col("event_id").asc))
      .select("n_pairs", "r1").as[(Long, Double)].collect()
    assert(lin.toSeq === Seq((4L, 1.0)))
    val alt = Extensions9.lag1Autocorr(
      ticks((1L to 5L).map(i => (1L, (if (i % 2 == 0) 2.0 else 1.0), i))),
      "user_id", "value", Seq(col("ts").asc, col("event_id").asc))
      .select("r1").as[Double].collect()
    assert(alt.toSeq === Seq(-1.0))
  }

  test("decay trend: one half-life halves the weight; fresh rows weigh 1") {
    // type a: 8.0 exactly 7 days (one half-life) before max day -> score 4
    // type b: 5.0 on the max day -> weight 1 -> score 5
    val df = Seq(("a", 8.0, "2024-01-01"), ("b", 5.0, "2024-01-08"))
      .toDF("event_type", "value", "d")
      .withColumn("__day", col("d").cast("date"))
    val got = Extensions9.decayScores(df, "event_type", "value", "__day", 7.0)
      .orderBy("event_type")
      .select("event_type", "n", "raw_sum", "decay_score")
      .as[(String, Long, Double, Double)].collect()
    assert(got.toSeq === Seq(("a", 1L, 8.0, 4.0), ("b", 1L, 5.0, 5.0)))
  }

  test("readability: counts and banding on a hand-computable doc") {
    // "Hello world. It is good." -> 5 words, 2 sentence runs,
    // vowel groups: e,o | o | i | i | oo = 6
    // flesch = 206.835 - 1.015*(5/2) - 84.6*(6/5) = 102.7775 -> easy
    val got = Extensions9.readability(
        Seq((1L, "Hello world. It is good.")).toDF("doc_id", "text"))
      .select("n_words", "n_sents", "n_vowel_groups", "flesch", "band")
      .as[(Int, Int, Int, Double, String)].collect()
    val (w, s, vg, f, band) = got.head
    assert((w, s, vg) === ((5, 2, 6)))
    assert(math.abs(f - 102.7775) < 1e-9)
    assert(band === "easy")
    // wall of unpunctuated dense text lands hard; n_sents floors at 1
    val hard = Extensions9.readability(
        Seq((2L, "straightforward encyclopaedia thoroughgoing")).toDF("doc_id", "text"))
      .select("n_sents", "band").as[(Int, String)].collect().head
    assert(hard === ((1, "hard")))
  }
}
