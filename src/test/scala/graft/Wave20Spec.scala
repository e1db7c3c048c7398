package graft

import graft.queries.Breadth20
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the twentieth wave (Breadth20 market-
  * microstructure measures). */
class Wave20Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long, String)]) =
    rows.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", lit("{}"))

  test("marketBeta: a key moving exactly with the market has beta 1 against " +
    "a two-key market; a 2x-amplified key has the amplified slope") {
    // two keys, four consecutive days; key 2 moves 2x key 1's diffs.
    // diffs: k1 = +100, -50, +20 ; k2 = +200, -100, +40 ; M = 3x k1 diff
    // beta_1 = cov(x, 3x)/var(3x) = 1/3 ; beta_2 = cov(2x, 3x)/var(3x) = 2/3
    val rows = for {
      (day, v) <- Seq(("01", 10.0), ("02", 11.0), ("03", 10.5), ("04", 10.7))
      k <- Seq(1L, 2L)
    } yield (k, if (k == 1L) v else 2 * v, k * 100 + day.toLong,
      s"2024-01-$day 10:00:00")
    val got = Breadth20.marketBeta(ticks(rows), "user_id", "ts", "value",
      "event_id")
      .orderBy("user_id").select("user_id", "n_days", "beta")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got.map(t => (t._1, t._2)) === Seq((1L, 3L), (2L, 3L)))
    assert(math.abs(got(0)._3.get - 1.0 / 3.0) < 1e-12)
    assert(math.abs(got(1)._3.get - 2.0 / 3.0) < 1e-12)
  }

  test("marketBeta: int64 moment overflow raises loudly instead of wrapping " +
    "(the decimal-twin guard) — and the guard is silent at sane magnitudes") {
    // one key, day-over-day cent diff ~5e9 -> market move m = 5e9,
    // m*m = 2.5e19 > Long.MaxValue: the int64 path wraps, the
    // DecimalType(38,0) twin does not -> divergence must raise
    val rows = Seq(
      (1L, 0.0, 1L, "2024-01-01 10:00:00"),
      (1L, 5.0e7, 2L, "2024-01-02 10:00:00"),
      (1L, 0.0, 3L, "2024-01-03 10:00:00"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // ANSI on (the Spark 4 default, what Verify/Bench run with): the
    // int64 multiply itself raises before the guard is consulted
    val ansiEx = intercept[Exception] {
      Breadth20.marketBeta(ticks(rows), "user_id", "ts", "value",
        "event_id").collect()
    }
    assert(msgs(ansiEx).exists(_.toLowerCase.contains("overflow")),
      ansiEx.toString)
    // ANSI off (the silent-wrap mode the round-7 ADVICE flagged): the
    // decimal-twin guard must turn the wrap into a loud raise
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val ex = intercept[Exception] {
        Breadth20.marketBeta(ticks(rows), "user_id", "ts", "value",
          "event_id").collect()
      }
      assert(msgs(ex).exists(_.contains("int64 overflow")), ex.toString)
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("marketBeta: non-consecutive days never pair (a gap is not a move)") {
    // days 1 and 3 only -> no calendar-consecutive pair -> key unscored
    val got = Breadth20.marketBeta(ticks(Seq(
      (1L, 10.0, 1L, "2024-01-01 10:00:00"),
      (1L, 99.0, 2L, "2024-01-03 10:00:00"))),
      "user_id", "ts", "value", "event_id").count()
    assert(got === 0)
  }

  test("amihud: aggregate ratio over scored days; zero-volume days excluded") {
    val rows = Seq(
      (1L, 10.00, 1L, "2024-01-01 10:00:00", """{"k": 5}"""),
      (1L, 10.40, 2L, "2024-01-02 10:00:00", """{"k": 4}"""),  // |40| / 4
      (1L, 10.30, 3L, "2024-01-03 10:00:00", """{}"""),        // no qty -> excluded
      (1L, 10.90, 4L, "2024-01-04 10:00:00", """{"k": 6}"""))  // |60| / 6
      .toDF("user_id", "value", "event_id", "at", "props")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth20.amihudIlliquidity(rows, "user_id", "ts", "value",
      "event_id", "k")
      .select("n_days", "sum_abs_move_cents", "sum_qty", "illiq")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // scored days: d2 (|1040-1000|=40, v=4) and d4 (|1090-1030|=60, v=6) —
    // d4's prior close is d3's (present day, volume irrelevant to the lag)
    assert(got === Seq((2L, 100L, 10L, 10.0)))
  }

  test("rollSpread: alternating bounce has negative serial covariance and " +
    "the textbook spread; a trending series is unscored") {
    // perfect bid-ask bounce +-50 cents: diffs alternate +100, -100 ->
    // cov = -100^2 cents^2 -> spread = 2*sqrt(10000)/100 = 2.00
    val bounce = (1 to 8).map(i =>
      (1L, if (i % 2 == 0) 10.5 else 9.5, i.toLong, f"2024-01-01 10:$i%02d:00"))
    // strict uptrend: diffs all +100 -> cov 0 -> unscored
    val trend = (1 to 6).map(i =>
      (2L, 9.0 + i, 100L + i, f"2024-01-01 10:$i%02d:00"))
    val got = Breadth20.rollSpread(ticks(bounce ++ trend), "user_id", "ts",
      "value", "event_id")
      .orderBy("user_id")
      .select("user_id", "n_pairs", "roll_spread")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got.length === 2)
    assert(got(0)._1 === 1L && got(0)._3.exists(s => math.abs(s - 2.0) < 1e-12))
    assert(got(1)._1 === 2L && got(1)._3.isEmpty)
  }

  test("dailySharpe: hand-computed ratio; a flat series is unscored") {
    // key 1 closes 10.00, 11.00, 10.50, 11.20 -> diffs +100, -50, +70
    // sx=120, sxx=17400, n=3 -> varNum = 3*17400 - 14400 = 37800
    // sharpe = 120 / sqrt(37800)
    val rows = Seq(
      (1L, 10.0, 1L, "2024-01-01 10:00:00"), (1L, 11.0, 2L, "2024-01-02 10:00:00"),
      (1L, 10.5, 3L, "2024-01-03 10:00:00"), (1L, 11.2, 4L, "2024-01-04 10:00:00"),
      (2L, 5.0, 11L, "2024-01-01 10:00:00"), (2L, 5.0, 12L, "2024-01-02 10:00:00"),
      (2L, 5.0, 13L, "2024-01-03 10:00:00"))
    val got = Breadth20.dailySharpe(ticks(rows), "user_id", "ts", "value",
      "event_id")
      .orderBy("user_id").select("user_id", "n_days", "sharpe_daily")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got(0) === ((1L, 3L, Some(120.0 / math.sqrt(37800.0)))))
    assert(got(1) === ((2L, 2L, None))) // zero variance -> unscored
  }

  test("Graft wave-20 facade methods match their oracle-checked queries") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
    val e = Tables.events(spark, sf0001)
    assert(rows(Graft.marketBeta(e, "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc)) ==
      rows(SparkEntry.queries("q_beta")(spark, sf0001)))
    assert(rows(Graft.amihudIlliquidity(e, "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc)) ==
      rows(SparkEntry.queries("q_amihud")(spark, sf0001)))
    assert(rows(Graft.rollSpread(e, "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc)) ==
      rows(SparkEntry.queries("q_roll_spread")(spark, sf0001)))
    assert(rows(Graft.dailySharpe(e, "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc)) ==
      rows(SparkEntry.queries("q_sharpe")(spark, sf0001)))
  }
}
