package graft

import graft.queries.{Breadth11, Extensions10}
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the eleventh wave (Breadth11 distribution
  * screens + Extensions10 selection/robustness ops): every assertion is
  * hand-computable from the fixture, independent of the DuckDB oracle. */
class Wave11Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long)]) =
    rows.toDF("user_id", "value", "event_id")
      .withColumn("ts", to_timestamp_ntz(
        concat(lit("2024-01-01 00:"), format_string("%02d", col("event_id")), lit(":00"))))

  test("cusum: a level shift scores the walk range, stationary pins 0") {
    // key 1: 1,1,1 then 5,5,5 — T=1800 cents, n=6, scaled walk
    // S = (-1200,-2400,-3600,-2400,-1200,0): range 3600 -> 3600/600 = 6.0
    // key 2: constant 2,2,2 -> walk identically 0
    val df = Breadth11.cusumRange(
      ticks(Seq((1L, 1.0, 1L), (1L, 1.0, 2L), (1L, 1.0, 3L),
        (1L, 5.0, 4L), (1L, 5.0, 5L), (1L, 5.0, 6L),
        (2L, 2.0, 1L), (2L, 2.0, 2L), (2L, 2.0, 3L))),
      "user_id", "value", Seq(col("ts").asc, col("event_id").asc))
      .orderBy("user_id")
      .select("user_id", "n_ticks", "cusum_range")
      .as[(Long, Long, Double)].collect().toSeq
    assert(df === Seq((1L, 6L, 6.0), (2L, 3L, 0.0)))
  }

  test("gini: equal volumes pin 0, one-key-takes-all pins 1/2 at n=2") {
    def gini(rows: Seq[(Long, Double, Long)]): Double =
      Breadth11.giniConcentration(ticks(rows), "user_id", "value")
        .select("gini").as[Double].head()
    assert(gini(Seq((1L, 3.0, 1L), (2L, 3.0, 2L))) === 0.0)
    // volumes (0, x): G = (2*(1*0 + 2*x) - 3*x) / (2*x) = 0.5
    assert(gini(Seq((1L, 0.0, 1L), (2L, 8.0, 2L))) === 0.5)
  }

  test("ks drift: disjoint supports pin 1, identical samples pin 0") {
    def ks(rows: Seq[(Long, Double, Long)]): Double =
      Breadth11.ksDrift(ticks(rows), "value", pmod(col("user_id"), lit(2)))
        .select("ks_stat").as[Double].head()
    // cohort 0 (even ids) all below cohort 1 (odd ids): D = 1
    assert(ks(Seq((0L, 1.0, 1L), (2L, 2.0, 2L),
      (1L, 3.0, 3L), (3L, 4.0, 4L))) === 1.0)
    // identical distributions: D = 0
    assert(ks(Seq((0L, 1.0, 1L), (2L, 2.0, 2L),
      (1L, 1.0, 3L), (3L, 2.0, 4L))) === 0.0)
  }

  test("hash sample: exact k per stratum, reproducible, small groups kept whole") {
    val docs = (1L to 20L).map(i => (i, if (i <= 12) "a" else "b"))
      .toDF("doc_id", "source")
    val s1 = Extensions10.hashSample(docs, "source", "doc_id", k = 5)
      .select("source", "sample_rank", "doc_id")
      .as[(String, Int, Long)].collect().toSeq.sorted
    assert(s1.count(_._1 == "a") === 5 && s1.count(_._1 == "b") === 5)
    // bit-for-bit reproducible — no RNG anywhere
    val s2 = Extensions10.hashSample(docs, "source", "doc_id", k = 5)
      .select("source", "sample_rank", "doc_id")
      .as[(String, Int, Long)].collect().toSeq.sorted
    assert(s1 === s2)
    // k larger than the stratum -> the whole stratum, ranked
    val tiny = Extensions10.hashSample(
      Seq((1L, "x"), (2L, "x")).toDF("doc_id", "source"),
      "source", "doc_id", k = 5)
      .select("sample_rank").as[Int].collect().toSeq.sorted
    assert(tiny === Seq(1, 2))
  }

  test("winsorize: rank clamp tames an outlier; singleton group is its own bound") {
    val docs = Seq((1L, "en", 1), (2L, "en", 2), (3L, "en", 3),
      (4L, "en", 4), (5L, "en", 100), (6L, "zh", 7))
      .toDF("doc_id", "lang", "n_chars")
    val got = Extensions10.winsorizedStats(docs, "lang", "n_chars", "doc_id", k = 2)
      .orderBy("lang")
      .select("lang", "n_docs", "lo", "hi", "win_sum", "win_mean")
      .as[(String, Long, Int, Int, Long, Double)].collect().toSeq
    // en: lo = 2nd smallest = 2, hi = 2nd largest = 4; clamped 2,2,3,4,4 = 15
    // zh: n=1 -> both bounds are the value itself
    assert(got === Seq(("en", 5L, 2, 4, 15L, 3.0), ("zh", 1L, 7, 7, 7L, 7.0)))
  }

  test("winsorize: n=2 crossed bounds re-order instead of emptying the range") {
    val docs = Seq((1L, "en", 10), (2L, "en", 20)).toDF("doc_id", "lang", "n_chars")
    val got = Extensions10.winsorizedStats(docs, "lang", "n_chars", "doc_id", k = 2)
      .select("lo", "hi", "win_sum").as[(Int, Int, Long)].head()
    // ra=2 -> 20 as lo0, rd=2 -> 10 as hi0; least/greatest restore lo<=hi
    assert(got === ((10, 20, 30L)))
  }

  test("dedup savings: non-canonical members accounted per source") {
    val clusters = Seq((10L, 10L), (11L, 10L), (12L, 10L), (20L, 20L), (21L, 20L))
      .toDF("doc_id", "cluster_id")
    val docs = Seq((10L, "a", 100), (11L, "a", 40), (12L, "b", 60),
      (20L, "b", 10), (21L, "b", 25))
      .toDF("doc_id", "source", "n_chars")
    val got = Extensions10.dedupSavings(clusters, docs)
      .orderBy("source")
      .select("source", "n_removed", "chars_removed")
      .as[(String, Long, Long)].collect().toSeq
    // removed: 11 (a,40), 12 (b,60), 21 (b,25); canonicals 10/20 kept
    assert(got === Seq(("a", 1L, 40L), ("b", 2L, 85L)))
  }

  test("Graft wave-11 facade methods match their oracle-checked queries") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
    val e = Tables.events(spark, sf0001)
    val d = Tables.documents(spark, sf0001)
    val ord = Seq(col("ts").asc, col("event_id").asc)
    assert(rows(Graft.changePointScreen(e, "user_id", "value", ord)
        .orderBy(col("user_id").asc)) ==
      rows(SparkEntry.queries("q_cusum")(spark, sf0001)))
    assert(rows(Graft.volumeGini(e, "user_id", "value")) ==
      rows(SparkEntry.queries("q_gini")(spark, sf0001)))
    assert(rows(Graft.ksDrift(e, "value", pmod(col("user_id"), lit(2)))) ==
      rows(SparkEntry.queries("q_ks_drift")(spark, sf0001)))
    assert(rows(Graft.evalSample(d, "source", "doc_id", 5)
        .select(col("source"), col("sample_rank"), col("doc_id"))
        .orderBy(col("source").asc, col("sample_rank").asc)) ==
      rows(SparkEntry.queries("q_hash_sample")(spark, sf0001)))
    assert(rows(Graft.winsorizedStats(d, "lang", "n_chars", "doc_id")
        .orderBy(col("lang").asc)) ==
      rows(SparkEntry.queries("q_winsorize")(spark, sf0001)))
    // the whole public path: pairs -> keep-list -> savings report
    val clusters = Graft.dedupKeepList(d, Graft.nearDupPairs(d))
      .select(col("doc_id"), col("cluster_id"))
    assert(rows(Graft.dedupSavings(clusters, d).orderBy(col("source").asc)) ==
      rows(SparkEntry.queries("q_dup_survivorship")(spark, sf0001)))
  }
}
