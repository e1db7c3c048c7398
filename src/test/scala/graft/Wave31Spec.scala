package graft

import graft.queries.Breadth31
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the thirty-first wave (Breadth31 weighted
  * MAs, gain/loss ratios, drawdown anatomy, bigram LM). */
class Wave31Spec extends SparkSpec {
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

  test("wma: a flat series pins wma = close; a known 10-bar ramp pins " +
    "the weighted mean; short series yield no rows") {
    val flat = Seq.fill(12)(1200L)
    val gotF = Breadth31.wma(ticks(series(flat)),
      "user_id", "ts", "value", "event_id")
      .select("wma").as[Double].collect().toSeq
    assert(gotF.length === 3 && gotF.forall(_ === 12.0))
    // ramp 100,200,…,1000: at bar 10 the weighted mean is
    // Σ_{j=0..9} (10−j)·c_{10−j} / 55 with c_i = i·100
    val ramp = (1 to 10).map(_ * 100L)
    val gotR = Breadth31.wma(ticks(series(ramp, key = 2L)),
      "user_id", "ts", "value", "event_id")
      .select("wma").as[Double].collect().toSeq
    val num = (0 until 10).map(j => (10 - j) * ramp(9 - j)).sum
    assert(gotR === Seq(num.toDouble / 55.0 / 100.0))
    val short = Seq.fill(9)(1000L)
    assert(Breadth31.wma(ticks(series(short, key = 3L)),
      "user_id", "ts", "value", "event_id").collect().isEmpty)
  }

  test("hma: a flat series pins hma = close (each WMA stage is the " +
    "identity there); the hand formula pins a moving series") {
    val flat = Seq.fill(12)(1500L)
    val gotF = Breadth31.hma(ticks(series(flat)),
      "user_id", "ts", "value", "event_id")
      .select("hma").as[Double].collect().toSeq
    assert(gotF.length === 3 && gotF.forall(_ === 15.0))
    val closes = (1 to 12).map(i => 1000L + i * i * 7L)
    val got = Breadth31.hma(ticks(series(closes, key = 2L)),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("hma").as[Double].collect().toSeq
    def wmaNum(n: Int, t: Int) = // t = 0-based bar index
      (0 until n).map(j => (n - j) * closes(t - j)).sum
    def raw(t: Int) = 2.0 * (wmaNum(4, t).toDouble / 10.0) -
      wmaNum(8, t).toDouble / 36.0
    val want = (9 until 12).map { t =>
      (3.0 * raw(t) + 2.0 * raw(t - 1) + 1.0 * raw(t - 2)) / 6.0 / 100.0
    }
    assert(got === want)
  }

  test("omega: known moves pin the gain/loss sums, the ratio and the " +
    "win rate; an all-gain series is unscored") {
    // moves: +10, −5, +20, −15 → gains 30, losses 20, 2 up of 4
    val closes = Seq(1000L, 1010L, 1005L, 1025L, 1010L)
    val got = Breadth31.omega(ticks(series(closes)),
      "user_id", "ts", "value", "event_id")
      .select("n_days", "n_up", "sum_gain_cents", "sum_loss_cents",
        "omega", "win_rate")
      .as[(Long, Long, Long, Long, Option[Double], Double)].collect().toSeq
    assert(got === Seq((4L, 2L, 30L, 20L, Some(1.5), 0.5)))
    val gains = Seq(1000L, 1010L, 1020L)
    val gotG = Breadth31.omega(ticks(series(gains, key = 2L)),
      "user_id", "ts", "value", "event_id")
      .select("omega").as[Option[Double]].collect().toSeq
    assert(gotG === Seq(None))
  }

  test("calmar: a known peak-trough-recovery series pins net, max " +
    "drawdown and the ratio; a monotone rise is unscored") {
    // 1000 → 1200 (peak) → 900 (dd 300) → 1300: net +300, maxdd 300
    val closes = Seq(1000L, 1200L, 900L, 1300L)
    val got = Breadth31.calmar(ticks(series(closes)),
      "user_id", "ts", "value", "event_id")
      .select("n_days", "net_cents", "max_dd_cents", "calmar")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(got === Seq((4L, 300L, 300L, Some(1.0))))
    val rise = Seq(1000L, 1100L, 1200L)
    val gotR = Breadth31.calmar(ticks(series(rise, key = 2L)),
      "user_id", "ts", "value", "event_id")
      .select("max_dd_cents", "calmar")
      .as[(Long, Option[Double])].collect().toSeq
    assert(gotR === Seq((0L, None)))
  }

  test("ddDuration: a two-spell fixture pins the island decomposition " +
    "(a day AT the running peak ends a spell); never-underwater keys " +
    "report zeros") {
    // closes: 10,8,9,11,11,10,12 → below: F,T,T,F,F,T,F
    val closes = Seq(1000L, 800L, 900L, 1100L, 1100L, 1000L, 1200L)
    val got = Breadth31.ddDuration(ticks(series(closes)),
      "user_id", "ts", "value", "event_id")
      .select("n_days", "n_underwater", "max_spell_bars", "n_spells")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((7L, 3L, 2L, 2L)))
    val flat = Seq(1000L, 1000L, 1000L)
    val gotF = Breadth31.ddDuration(ticks(series(flat, key = 2L)),
      "user_id", "ts", "value", "event_id")
      .select("n_underwater", "max_spell_bars", "n_spells")
      .as[(Long, Long, Long)].collect().toSeq
    assert(gotF === Seq((0L, 0L, 0L)))
  }

  test("bigramLm: a tiny corpus pins the interpolated probabilities by " +
    "hand; repeated phrasing scores higher than novel phrasing") {
    val docs = Seq(
      (1L, "the cat sat"), (2L, "the cat sat"), (3L, "the dog ran"))
      .toDF("doc_id", "text")
    val uc = docs.select(explode(graft.text.Text.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("true_n"))
    val got = Breadth31.bigramLmDocs(docs, uc)
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "avg_log2p")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._2) === Seq(2L, 2L, 2L))
    // hand model: N=9 tokens, V=5 types (the, cat, sat, dog, ran)
    val N = 9.0; val V = 5.0
    def p(c12: Long, c1: Long, c2: Long): Double =
      (4.0 / 5.0) * (c12.toDouble / c1.toDouble) +
        (1.0 - 4.0 / 5.0) * ((c2 + 1).toDouble / (N + V))
    def lpq(x: Double): Long = math.floor(1.0e6 * (math.log(x) / math.log(2.0))).toLong
    // doc1/2: (the,cat) c12=2 c(the)=3 c(cat)=2 ; (cat,sat) c12=2 c=2,2
    val d1 = (lpq(p(2, 3, 2)) + lpq(p(2, 2, 2))).toDouble / 2.0 / 1.0e6
    // doc3: (the,dog) c12=1 c=3,1 ; (dog,ran) c12=1 c=1,1
    val d3 = (lpq(p(1, 3, 1)) + lpq(p(1, 1, 1))).toDouble / 2.0 / 1.0e6
    assert(math.abs(got(0)._3 - d1) < 1e-9 && math.abs(got(1)._3 - d1) < 1e-9)
    assert(math.abs(got(2)._3 - d3) < 1e-9)
    assert(got(0)._3 > got(2)._3, "repeated phrasing scores higher")
  }
}
