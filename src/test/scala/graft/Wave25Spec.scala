package graft

import graft.queries.Breadth25
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the twenty-fifth wave (Breadth25 risk &
  * dependence statistics). */
class Wave25Spec extends SparkSpec {
  import spark.implicits._

  /** One tick per day per key, with an optional per-day quantity prop. */
  private def ticks(rows: Seq[(Long, Double, Long, String, Long)]) =
    rows.toDF("user_id", "value", "event_id", "at", "k")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", concat(lit("{\"k\":"), col("k"), lit("}")))
      .drop("k")

  private def day(i: Int) = f"2024-01-$i%02d 10:00:00"

  /** Closes in cents + per-day quantities → single-tick daily series. */
  private def series(closes: Seq[Long], qtys: Seq[Long], key: Long = 1L) =
    closes.zip(qtys).zipWithIndex.map { case ((c, q), i) =>
      (key, c.toDouble / 100.0, i.toLong + 1, day(i + 1), q)
    }

  test("varEs: the 20% tail of a hand series picks the exact order " +
    "statistics — k = ceil(n/5), VaR = k-th smallest diff, ES = tail mean") {
    // closes -> diffs: -300, +100, -50, +200, -700, +400, -100, +50, -250
    // n = 9 -> k = ceil(9/5) = 2; two smallest: -700, -300
    // var_cents = -300 (the 2nd smallest), es = -(-1000)/200 = 5.00
    val closes = Seq(1000L, 700L, 800L, 750L, 950L, 250L, 650L, 550L, 600L,
      350L)
    val got = Breadth25.varEs(
      ticks(series(closes, Seq.fill(closes.length)(1L))),
      "user_id", "ts", "value", "event_id")
      .select("n_days", "k_tail", "var_cents", "var_loss", "es_loss")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq((9L, 2L, -300L, 3.0, 5.0)))
  }

  test("varEs: a boundary tie cannot diverge — equal diffs at the cut " +
    "select the same multiset either way") {
    // diffs: -100, -100, +50, +50, +50 -> n = 5, k = 1; the two -100s tie
    // at the boundary: var = -100 whichever is ranked first
    val closes = Seq(1000L, 900L, 800L, 850L, 900L, 950L)
    val got = Breadth25.varEs(
      ticks(series(closes, Seq.fill(closes.length)(1L))),
      "user_id", "ts", "value", "event_id")
      .select("k_tail", "var_cents", "es_loss")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, -100L, 1.0)))
  }

  test("spearman: monotone price-volume agreement pins rho = 1, perfect " +
    "opposition pins rho = -1, and sum_d2 is the exact integer") {
    // key 1: volume rises with price -> identical permutations, d = 0
    val up = series(Seq(1000L, 1100L, 1200L, 1300L), Seq(10L, 20L, 30L, 40L))
    // key 2: volume falls as price rises -> reversed permutation
    // n = 4: sum_d2 = (1-4)^2+(2-3)^2+(3-2)^2+(4-1)^2 = 20 ;
    // rho = (4*15 - 6*20)/(4*15) = -1
    val dn = series(Seq(1000L, 1100L, 1200L, 1300L), Seq(40L, 30L, 20L, 10L),
      key = 2L)
    val got = Breadth25.spearman(ticks(up ++ dn), "user_id", "ts", "value",
      "event_id", "k")
      .orderBy("user_id").select("user_id", "n_days", "sum_d2", "rho")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 4L, 0L, 1.0), (2L, 4L, 20L, -1.0)))
  }

  test("kendall: agreement pins tau = 1 (0 inversions), opposition tau = -1 " +
    "(all pairs inverted), and a hand case pins the count") {
    val up = series(Seq(1000L, 1100L, 1200L, 1300L), Seq(10L, 20L, 30L, 40L))
    val dn = series(Seq(1000L, 1100L, 1200L, 1300L), Seq(40L, 30L, 20L, 10L),
      key = 2L)
    // key 3 volumes in price order: 10, 30, 20, 40 -> rv = 1,3,2,4 ->
    // 1 inversion; tau = (12 - 4)/12 = 2/3
    val mid = series(Seq(1000L, 1100L, 1200L, 1300L), Seq(10L, 30L, 20L, 40L),
      key = 3L)
    val got = Breadth25.kendall(ticks(up ++ dn ++ mid), "user_id", "ts",
      "value", "event_id", "k")
      .orderBy("user_id").select("user_id", "n_days", "n_inversions", "tau")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 4L, 0L, 1.0), (2L, 4L, 6L, -1.0),
      (3L, 4L, 1L, 2.0 / 3.0)))
  }

  test("inversions: the merge-sort count equals the O(L^2) brute force on " +
    "exhaustive small permutations and a fixed larger shuffle") {
    def brute(xs: Seq[Long]): Long =
      (for (i <- xs.indices; j <- i + 1 until xs.length
            if xs(i) > xs(j)) yield 1L).sum
    Seq(1, 2, 3, 4).permutations.foreach { p =>
      val xs = p.map(_.toLong)
      assert(Breadth25.inversions(xs) === brute(xs), xs.toString)
    }
    // deterministic pseudo-shuffle of 1..40 (no RNG in specs)
    val big = (1L to 40L).sortBy(x => (x * 17) % 41)
    assert(Breadth25.inversions(big) === brute(big))
    assert(Breadth25.inversions(Seq.empty) === 0L)
    assert(Breadth25.inversions(Seq(7L)) === 0L)
  }

  test("hurstRs: the alternating walk pins the integer range and the " +
    "one-division R/S; a constant-diff series is unscored (zero variance)") {
    // closes 1000,1100,1000,1100,1000 -> diffs +100,-100,+100,-100 (n=4)
    // P = 100,0,100,0 ; T = 0 -> S_i = n*P_i - i*T = {400, 0, 400, 0}
    // range = 400 ; varnum = 4*40000 - 0 = 160000 -> rs = 400/sqrt(160000)
    // = 1.0 -> hurst = ln(1)/ln(4) = 0
    val alt = series(Seq(1000L, 1100L, 1000L, 1100L, 1000L),
      Seq.fill(5)(1L))
    // key 2: constant +100 diffs -> varnum = n*sxx - t^2 = 4*40000-160000 = 0
    val lin = series(Seq(1000L, 1100L, 1200L, 1300L, 1400L), Seq.fill(5)(1L),
      key = 2L)
    val got = Breadth25.hurstRs(ticks(alt ++ lin), "user_id", "ts", "value",
      "event_id")
      .orderBy("user_id")
      .select("user_id", "n_days", "range_scaled", "rs", "hurst")
      .as[(Long, Long, Long, Option[Double], Option[Double])].collect().toSeq
    assert(got(0) === ((1L, 4L, 400L, Some(1.0), Some(0.0))))
    assert(got(1)._1 === 2L)
    assert(got(1)._4.isEmpty && got(1)._5.isEmpty)
  }

  test("hurstRs: a persistent two-regime walk scores a higher exponent " +
    "than the alternating one (the long-memory ordering the screen " +
    "exists for), both closed-form") {
    // regime walk: four +100 diffs then four -100 (n=8, T=0):
    // S_i = 8*P_i peaks at 3200 -> rs = 3200/sqrt(8*80000) = 4
    // -> hurst = ln(4)/ln(8) = 2/3 -> 0.6667
    val persist = series(Seq(1000L, 1100L, 1200L, 1300L, 1400L, 1300L,
      1200L, 1100L, 1000L), Seq.fill(9)(1L))
    // alternating: rs = 1 -> hurst = 0 (the spec above, at n=8)
    val churn = series(Seq(1000L, 1100L, 1000L, 1100L, 1000L, 1100L,
      1000L, 1100L, 1000L), Seq.fill(9)(1L), key = 2L)
    val got = Breadth25.hurstRs(ticks(persist ++ churn), "user_id", "ts",
      "value", "event_id")
      .orderBy("user_id").select("hurst")
      .as[Option[Double]].collect().toSeq
    assert(got === Seq(Some(0.6667), Some(0.0)))
  }
}
