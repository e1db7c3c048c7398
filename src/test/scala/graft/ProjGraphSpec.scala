package graft

import graft.ops.GlobalRank
import graft.queries.{Breadth43, Breadth141}
import graft.sim.ProjGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins for the projection-window approximate kNN graph (the round-13
  * default global-graph build) and its distributed global-rank
  * primitive. The DuckDB differential checks the construction itself
  * (Breadth141.projMutualCtes mirrors it); these pins cover the
  * properties the differential cannot see — the distributed rank's
  * equality with the single-partition definition, degenerate-coverage
  * equality with the exact build, determinism, and measured recall
  * against the exact IVF reference. */
class ProjGraphSpec extends SparkSpec {
  import spark.implicits._

  private val sf001 = "/root/testdata/sf0.01"

  private def edgeSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("GlobalRank equals the single-partition row_number definition " +
    "(unique keys, arbitrary input partitioning)") {
    val df = (1L to 500L).map(i => (i, (i * 7919L) % 101L))
      .toDF("id", "v").repartition(7)
    val got = GlobalRank.withGlobalRank(df, "grk", col("v"), col("id"))
      .select(col("id"), col("grk"))
    val want = df.withColumn("grk",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select(col("id"), col("grk"))
    assert(edgeSet(got) == edgeSet(want))
  }

  test("degenerate coverage: with n <= W the window candidates span all " +
    "pairs, so the approximate directed top-k EQUALS the exact build") {
    val emb = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") < ProjGraph.WindowW)
    val approx = edgeSet(ProjGraph.approxDirectedTopK(emb, 4))
    val exact = edgeSet(Breadth141.globalKnnDirected(emb, 4))
    assert(approx == exact)
  }

  test("deterministic: two independent builds produce the same mutual " +
    "edge set, canonical a<b, mutuality holds") {
    val emb = Tables.embeddings(spark, sf0001)
    val e1 = edgeSet(ProjGraph.approxMutualEdges(emb, 4))
    val e2 = edgeSet(ProjGraph.approxMutualEdges(emb, 4))
    assert(e1 == e2)
    assert(e1.forall { case (a, b) => a < b })
    val directed = edgeSet(ProjGraph.approxDirectedTopK(emb, 4))
    e1.foreach { case (a, b) =>
      assert(directed.contains((a, b)) && directed.contains((b, a)),
        s"mutual edge ($a,$b) must be ranked by both endpoints")
    }
  }

  test("plan pins: the projection-graph tail keeps equi-join shapes — " +
    "no cartesian product, no nested-loop join, no single-partition " +
    "data exchange") {
    val emb = Tables.embeddings(spark, sf0001)
    val p = ProjGraph.approxMutualEdges(emb, 4)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct"), p.take(500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(500))
    // the graph tail (post plan-boundary) must also never collapse the
    // edge data to one partition — the only single-partition pass in
    // the whole build is GlobalRank's one-row-per-partition offsets
    // cumsum, which sits behind the rank's checkpoint boundary
    assert(!p.contains("Exchange SinglePartition"), p.take(800))
    val ranked = GlobalRank.withGlobalRank(
      (1L to 64L).map(i => (i, i % 7)).toDF("id", "v"), "r",
      col("v"), col("id"))
    val rp = ranked.queryExecution.executedPlan.toString()
    assert(!rp.contains("CartesianProduct"), rp.take(500))
  }

  test("facade delegations: Graft.globalRank / mutualEdges / " +
    "mutualEdgesExact match their module twins") {
    val emb = Tables.embeddings(spark, sf0001)
    assert(edgeSet(Graft.mutualEdges(emb)) ==
      edgeSet(ProjGraph.approxMutualEdges(emb, 4)))
    assert(edgeSet(Graft.mutualEdgesExact(emb)) ==
      edgeSet(Breadth141.globalMutualEdgesExact(emb)))
    val df = (1L to 100L).map(i => (i, i % 13)).toDF("id", "v")
    assert(edgeSet(Graft.globalRank(df, "r", col("v"), col("id"))
        .select(col("id"), col("r"))) ==
      edgeSet(GlobalRank.withGlobalRank(df, "r", col("v"), col("id"))
        .select(col("id"), col("r"))))
  }

  test("measured recall vs the exact IVF reference at sf0.01: avg " +
    "directed top-4 recall >= 0.8 on the random-noise corpus") {
    val emb = Tables.embeddings(spark, sf001)
    val exact = edgeSet(Breadth141.globalKnnDirected(emb, 4))
    val approx = edgeSet(ProjGraph.approxDirectedTopK(emb, 4))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall regressed: $recall (measured 0.956)")
  }

  test("adaptiveWindow: W doubles per 4x of corpus past 512 rows (the " +
    "recall knob's closed form), and boundaries are exact") {
    assert(ProjGraph.adaptiveWindow(1L) == ProjGraph.WindowW)
    assert(ProjGraph.adaptiveWindow(500L) == ProjGraph.WindowW)
    assert(ProjGraph.adaptiveWindow(512L) == ProjGraph.WindowW)
    assert(ProjGraph.adaptiveWindow(513L) == ProjGraph.WindowW * 2)
    assert(ProjGraph.adaptiveWindow(2000L) == ProjGraph.WindowW * 2)
    assert(ProjGraph.adaptiveWindow(2048L) == ProjGraph.WindowW * 2)
    assert(ProjGraph.adaptiveWindow(2049L) == ProjGraph.WindowW * 4)
    assert(ProjGraph.adaptiveWindow(8192L) == ProjGraph.WindowW * 4)
    assert(ProjGraph.adaptiveWindow(20000L) == ProjGraph.WindowW * 8)
    // the SQL twin's closed form — the expression the clustered-recall
    // oracle computes — must agree with the loop at every rule point
    def closedForm(n: Long): Int = {
      val t = math.max(0.0,
        math.ceil(math.log(n.toDouble / 512.0) / math.log(2.0) / 2.0))
      ProjGraph.WindowW * math.pow(2.0, t).toInt
    }
    Seq(1L, 100L, 500L, 512L, 513L, 1000L, 2000L, 2048L, 2049L, 5000L,
      8192L, 8193L, 20000L, 100000L).foreach { n =>
      assert(ProjGraph.adaptiveWindow(n) == closedForm(n),
        s"rule/closed-form divergence at n=$n")
    }
  }

  test("approxDirectedTopK honors a wider window: with W >= n the " +
    "candidate set is all pairs, so the result equals the exact build " +
    "even where the default window would miss neighbours") {
    val emb = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") < 200)
    val wide = edgeSet(ProjGraph.approxDirectedTopK(emb, 4, window = 256))
    val exact = edgeSet(Breadth141.globalKnnDirected(emb, 4))
    assert(wide == exact)
  }

  test("clustered corpus: deterministic, exact-integer doubles, and " +
    "within-label cosine dominates cross-label (the regime the " +
    "clustered recall audit measures)") {
    val emb = Tables.embeddings(spark, sf0001)
    val c1 = Breadth141.clusteredCorpus(emb)
    val rows = c1.collect()
    assert(rows.length == emb.count())
    // every component is an exact integer stored as double
    rows.take(20).foreach { r =>
      r.getSeq[Double](r.fieldIndex("cvec")).foreach(v =>
        assert(v == math.rint(v), s"non-integer component $v"))
    }
    // within-label mean cosine far above cross-label
    val pairs = c1.as("a").join(c1.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select((col("a.label") === col("b.label")).as("same"),
        graft.sim.Similarity.cosine(col("a.cvec"), col("b.cvec")).as("cos"))
      .groupBy(col("same")).agg(avg(col("cos")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(pairs(true) > 0.8, s"within-label cosine ${pairs(true)}")
    assert(math.abs(pairs(false)) < 0.3, s"cross-label cosine ${pairs(false)}")
  }

  test("memo-internal sizing (round 14): with the projwin memo warm, a " +
    "second build runs NO job for the sizing count — and the result is " +
    "unchanged") {
    val emb = Tables.embeddings(spark, sf0001)
    // first build warms the projwin store (and proves the path end-to-end)
    val first = edgeSet(ProjGraph.approxDirectedTopK(emb, 4))
    // the sizing count lives INSIDE the memo block, so a memo-hit call
    // must not re-run emb.count(): no submitted job may have the
    // count's callsite. (The underfull probe and the checkpoint jobs
    // legitimately run — this pin is only about the sizing count.)
    val countJobs = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
        if (ss.stageInfo.name.startsWith("count at ProjGraph")) {
          countJobs.incrementAndGet(): Unit
        }
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val again = edgeSet(ProjGraph.approxDirectedTopK(emb, 4))
      org.apache.spark.graft.SparkInternals.flushListenerBus(spark.sparkContext)
      assert(countJobs.get() == 0,
        s"memo-hit build re-ran the sizing count ${countJobs.get()} times")
      assert(again == first)
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
