package graft

import graft.queries.Breadth13
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the thirteenth wave (Breadth13 pattern
  * detection and dispersion). */
class Wave13Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long, String)]) =
    rows.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("candle patterns: doji, bullish engulfing, hammer flags from integer bars") {
    // day 1: down bar o=5.00 c=3.00 h=5.50 l=2.50
    // day 2: up bar o=2.80 c=5.20 engulfing day 1's body; big body -> no doji
    // day 3: hammer — o=5.00 c=4.90 (body 10), low 4.00 (lower shadow 90),
    //        high 5.05 (upper shadow 5); range 105, body*20=200 > 105 -> no doji
    val bars = Breadth13.candlePatterns(ticks(Seq(
      (1L, 5.0, 1L, "2024-01-01 10:00:00"), (1L, 5.5, 2L, "2024-01-01 11:00:00"),
      (1L, 2.5, 3L, "2024-01-01 12:00:00"), (1L, 3.0, 4L, "2024-01-01 13:00:00"),
      (1L, 2.8, 5L, "2024-01-02 10:00:00"), (1L, 5.2, 6L, "2024-01-02 11:00:00"),
      (1L, 5.0, 7L, "2024-01-03 10:00:00"), (1L, 5.05, 8L, "2024-01-03 11:00:00"),
      (1L, 4.0, 9L, "2024-01-03 12:00:00"), (1L, 4.9, 10L, "2024-01-03 13:00:00"))),
      "user_id", "ts", "value", "event_id")
      .orderBy("day")
      .select("open", "close", "high", "low", "doji", "bullish_engulf", "hammer")
      .as[(Long, Long, Long, Long, Boolean, Boolean, Boolean)].collect().toSeq
    assert(bars === Seq(
      (500L, 300L, 550L, 250L, false, false, false),
      (280L, 520L, 520L, 280L, false, true, false),
      (500L, 490L, 505L, 400L, false, false, true)))
  }

  test("candle patterns: a flat bar is a doji (zero body, any range)") {
    val bars = Breadth13.candlePatterns(ticks(Seq(
      (1L, 3.0, 1L, "2024-01-01 10:00:00"), (1L, 3.5, 2L, "2024-01-01 11:00:00"),
      (1L, 3.0, 3L, "2024-01-01 12:00:00"))),
      "user_id", "ts", "value", "event_id")
      .select("doji").as[Boolean].head()
    assert(bars === true)
  }

  test("token skew: a token exclusive to the target source tops the report") {
    val docs = Seq(
      (1L, "alpha alpha alpha beta", "src0"),
      (2L, "beta gamma", "src1"),
      (3L, "beta gamma gamma", "src2"))
      .toDF("doc_id", "text", "source")
    val got = Breadth13.tokenSkew(docs, "text", col("source") === "src0", 3)
      .select("tok", "n_target", "n_rest", "skew")
      .as[(String, Long, Long, Long)].collect().toSeq
    // totals: target 4 tokens, rest 5. alpha: |3*5 - 0*4| = 15
    // gamma: |0*5 - 3*4| = 12; beta: |1*5 - 2*4| = 3
    assert(got === Seq(("alpha", 3L, 0L, 15L), ("gamma", 0L, 3L, 12L),
      ("beta", 1L, 2L, 3L)))
  }

  test("burstiness: metronome pins 0, a burst-then-silence series scores high") {
    def b(times: Seq[String]): Option[Double] =
      Breadth13.burstiness(ticks(times.zipWithIndex.map { case (t, i) =>
        (1L, 1.0, i.toLong, t) }), "user_id", "ts", "event_id")
        .select("burstiness").as[Option[Double]].head()
    // gaps 60,60,60 -> variance 0 -> 0.0
    assert(b(Seq("2024-01-01 10:00:00", "2024-01-01 10:01:00",
      "2024-01-01 10:02:00", "2024-01-01 10:03:00")) === Some(0.0))
    // gaps 1,1,3598 (burst then silence) -> far above Poisson
    val bursty = b(Seq("2024-01-01 10:00:00", "2024-01-01 10:00:01",
      "2024-01-01 10:00:02", "2024-01-01 11:00:00")).get
    assert(bursty > 1000.0)
    // single gap -> unscored
    assert(b(Seq("2024-01-01 10:00:00", "2024-01-01 10:01:00")) === None)
  }

  test("Graft wave-13 facade methods match their oracle-checked queries") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
    val e = Tables.events(spark, sf0001)
    val d = Tables.documents(spark, sf0001)
    assert(rows(Graft.candlePatterns(e, "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc, col("day").asc)) ==
      rows(SparkEntry.queries("q_candle_patterns")(spark, sf0001)))
    assert(rows(Graft.tokenSkew(d, "text", col("source") === "src0", 20)) ==
      rows(SparkEntry.queries("q_token_skew")(spark, sf0001)))
    assert(rows(Graft.burstiness(e, "user_id", "ts", "event_id")
        .orderBy(col("user_id").asc)) ==
      rows(SparkEntry.queries("q_burstiness")(spark, sf0001)))
  }
}
