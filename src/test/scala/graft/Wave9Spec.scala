package graft

import graft.queries.{Breadth9, Extensions8}
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the ninth wave (Breadth9 temporal/operational
  * idioms + Extensions8 information-theory/graph ops): every assertion is
  * hand-computable from the fixture, independent of the DuckDB oracle. */
class Wave9Spec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, String, Double, Long)]) =
    rows.toDF("user_id", "t", "value", "event_id")
      .select(col("user_id"), to_timestamp_ntz(col("t")).as("ts"),
        col("value"), col("event_id"))

  test("interval overlap: bucket-local pairs, asymmetric, touching counts") {
    // day 1: A [10:00,11:00], B [10:30,12:00], C [13:00,14:00]
    //   -> only (A,B) overlap; C disjoint. Touching endpoints count
    //   (closed intervals): D day 2 [09:00,10:00], E day 2 [10:00,11:00].
    val iv = Breadth9.dayIntervals(ev(Seq(
      (1L, "2024-01-01 10:00:00", 0.0, 1L), (1L, "2024-01-01 11:00:00", 0.0, 2L),
      (2L, "2024-01-01 10:30:00", 0.0, 3L), (2L, "2024-01-01 12:00:00", 0.0, 4L),
      (3L, "2024-01-01 13:00:00", 0.0, 5L), (3L, "2024-01-01 14:00:00", 0.0, 6L),
      (4L, "2024-01-02 09:00:00", 0.0, 7L), (4L, "2024-01-02 10:00:00", 0.0, 8L),
      (5L, "2024-01-02 10:00:00", 0.0, 9L), (5L, "2024-01-02 11:00:00", 0.0, 10L))),
      "user_id", "ts")
    val pairs = Breadth9.overlapPairsPerDay(iv, "user_id")
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (4L, 5L)))
  }

  test("transitions: lag over the per-key order, probabilities per source") {
    // user 1: a -> b -> a -> b ; user 2: a -> a
    // transitions: (a,b)=2, (b,a)=1, (a,a)=1 ; p(a->b)=2/3, p(a->a)=1/3
    val df = Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "a", 3L), (1L, "b", 4L),
      (2L, "a", 5L), (2L, "a", 6L))
      .toDF("user_id", "event_type", "event_id")
      .withColumn("ts", to_timestamp_ntz(
        concat(lit("2024-01-01 00:0"), col("event_id"), lit(":00"))))
    val got = Breadth9.transitions(df, "user_id", "event_type",
        Seq(col("ts").asc, col("event_id").asc))
      .select("prev_type", "curr_type", "n", "p")
      .as[(String, String, Long, Double)].collect().toSet
    assert(got === Set(("a", "b", 2L, 0.6667), ("b", "a", 1L, 1.0),
      ("a", "a", 1L, 0.3333)))
  }

  test("rolling z-score: scored only with a full 6-row history; spike flagged") {
    // values 1..6 then 100: row 7 sees mean 3.5, sd = stddev([1..6]) =
    // 1.8708..., z = (100-3.5)/sd = 51.5815...; rows 1..6 unscored.
    val rows = (1 to 6).map(i => (1L, s"2024-01-01 00:0$i:00", i.toDouble, i.toLong)) :+
      ((1L, "2024-01-01 00:07:00", 100.0, 7L))
    val got = Breadth9.rollingZscore(ev(rows), "user_id", "value",
        Seq(col("ts").asc, col("event_id").asc))
      .select("event_id", "mean_prev", "z").as[(Long, Double, Double)].collect()
    assert(got.length === 1)
    val (id, mu, z) = got.head
    assert(id === 7L && mu === 3.5)
    val sd = math.sqrt((1 to 6).map(v => math.pow(v - 3.5, 2)).sum / 5)
    assert(z === math.rint((100.0 - 3.5) / sd * 10000) / 10000)
  }

  test("compaction plan: greedy cumulative bins split at the target") {
    // counts 5,5,5 with target 10: cum 5,10,15; bin=(cum-n) div 10 ->
    // 0,0,1 — first two days packed, third alone.
    val perDay = Seq(("2024-01-01", 5L), ("2024-01-02", 5L), ("2024-01-03", 5L))
      .toDF("d", "n").select(to_date(col("d")).as("day"), col("n"))
    val got = Breadth9.compactionPlan(perDay, "day", "n", 10L)
      .select("bin_id", "n_days", "n_rows").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 2L, 10L), (1L, 1L, 5L)))
  }

  test("token entropy: uniform 2-token doc = 1 bit, constant doc = 0") {
    val df = Seq((1L, "a a b b"), (2L, "a a a a")).toDF("doc_id", "text")
    val perTok = df
      .select(col("doc_id"), explode(graft.text.Text.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val h = perTok.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"),
        sum(col("c").cast("double") * log2(col("c").cast("double"))).as("clc"))
      .select(col("doc_id"),
        round(log2(col("n").cast("double")) - col("clc") / col("n"), 4).as("h"))
      .as[(Long, Double)].collect().toMap
    assert(h === Map(1L -> 1.0, 2L -> 0.0))
  }

  test("pagerank: symmetric two-node graph stays uniform; star centre leads") {
    val two = Seq((10L, 20L)).toDF("id_a", "id_b")
    val prTwo = Extensions8.pagerank(two, 3)
      .select(col("node"), round(col("pr"), 6).as("pr"))
      .as[(Long, Double)].collect().toMap
    assert(prTwo === Map(10L -> 0.5, 20L -> 0.5))

    // star A-B, A-C: hand power iteration with d=0.85, 3 rounds
    val star = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    var (ra, rb) = (1.0 / 3, 1.0 / 3)
    for (_ <- 1 to 3) {
      val (na, nb) = (0.15 / 3 + 0.85 * 2 * rb, 0.15 / 3 + 0.85 * ra / 2)
      ra = na; rb = nb
    }
    val got = Extensions8.pagerank(star, 3)
      .select(col("node"), round(col("pr"), 6).as("pr"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) === math.rint(ra * 1e6) / 1e6)
    assert(got(2L) === math.rint(rb * 1e6) / 1e6)
    assert(got(2L) === got(3L))
    assert(got(1L) > got(2L))
  }

  test("pmi/unigram fixtures: independent tokens score 0 PMI; " +
    "uniform unigram ppl equals vocab size") {
    // Every doc contains {x, y}: n_xy = D, n_x = n_y = D ->
    // pmi = log2(D·D / D·D) = 0.
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "y x")).toDF("doc_id", "text")
    val dt = docs.select(col("doc_id"),
      explode(array_distinct(graft.text.Text.tokens(col("text")))).as("tok"))
    val pairs = dt.select(col("doc_id"), col("tok").as("tok_a"))
      .join(dt.select(col("doc_id"), col("tok").as("tok_b")), Seq("doc_id"))
      .filter(col("tok_a") < col("tok_b"))
      .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("n_ab"))
      .as[(String, String, Long)].collect().toSeq
    assert(pairs === Seq(("x", "y", 3L)))
    // pmi = log2(n_ab * D / (n_a * n_b)) = log2(3*3/(3*3)) = 0
    assert(math.log(3.0 * 3 / (3 * 3)) / math.log(2) === 0.0)

    // Uniform corpus "a b" repeated: every token has p=(c+1)/(N+V);
    // with c=3, N=6, V=2 -> p=1/2 exactly; avg_logp=-1, ppl=2.
    val n = 6L; val v = 2L; val c = 3L
    val lp = math.log((c + 1).toDouble / (n + v)) / math.log(2)
    assert(lp === -1.0 && math.pow(2, -lp) === 2.0)
  }
}
