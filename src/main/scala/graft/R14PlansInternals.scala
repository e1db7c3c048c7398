package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Round-14 plan evidence, part 2: the ITERATION subtrees of the
  * iterative-graph tier and the basket pair-table build. The facade
  * plans root at the final localCheckpoint/memo boundary (LogicalRDD /
  * store scan), so the join shapes the round optimized are invisible
  * there; this main explains one representative iteration join the way
  * the loop actually builds it. Args: outDir suffix [sfDir]. */
object R14PlansInternals {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = s"# $name ($suffix) — explain(formatted), $dir, local[4]\n\n" +
        df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim + "\n"
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"wrote ${name}_$suffix.txt")
    }

    // ---- PageRank iteration: bucketed edge store on src, memoized
    // outdeg; the contribs join + dst groupBy exactly as the loop
    // builds it (rank frame stands in for generation k).
    val edgesRaw = Tables.lineitem(spark, dir).select(
      (col("l_suppkey") * 2L).as("src"),
      (col("l_partkey") * 2L + 1L).as("dst"))
    val prEdges = graft.queries.Breadth13.memoizedOnPlanStored(
        edgesRaw, "pr_edges_bsrc") {
      val dist = graft.queries.Breadth13.memoizedOnPlan(edgesRaw, "r14p_pr_dist") {
        edgesRaw.select(col("src"), col("dst")).distinct()
      }
      graft.queries.Extensions.bucketedToStore(dist, "src",
        graft.queries.Extensions.bucketsForRows(dist.count()))
    }
    val prOutdeg = graft.queries.Breadth13.memoizedOnPlan(edgesRaw, "pr_outdeg") {
      prEdges.groupBy(col("src")).agg(count(lit(1)).as("od"))
    }
    val r0 = prEdges.select(col("src").as("node")).distinct()
      .withColumn("r", lit(1000000000L))
    dump("pr_iteration", r0
      .join(prOutdeg, r0("node") === prOutdeg("src"))
      .select(col("node"), expr("(17 * r) div (20 * od)").as("ct"))
      .join(prEdges, col("node") === prEdges("src"))
      .groupBy(col("dst")).agg(sum(col("ct")).as("s")))

    // ---- HITS authority pass: the dst-bucketed orientation joined by
    // the hub-score frame, grouped on src.
    val hitsRaw = Tables.lineitem(spark, dir).select(
      concat(lit("s"), col("l_suppkey")).as("src"),
      concat(lit("p"), col("l_partkey")).as("dst"))
    val hEdges = graft.queries.Breadth13.memoizedOnPlanStored(
        hitsRaw, "hits_edges_bsrc") {
      val dist = graft.queries.Breadth13.memoizedOnPlan(hitsRaw, "r14p_hits_dist") {
        hitsRaw.select(col("src"), col("dst")).distinct()
      }
      graft.queries.Extensions.bucketedToStore(dist, "src",
        graft.queries.Extensions.bucketsForRows(dist.count()))
    }
    val hEdgesByDst = graft.queries.Breadth13.memoizedOnPlanStored(
        hitsRaw, "hits_edges_bdst") {
      graft.queries.Extensions.bucketedToStore(hEdges, "dst",
        graft.queries.Extensions.bucketsForRows(hEdges.count()))
    }
    val h0 = hEdges.select(col("src")).distinct().withColumn("h", lit(1000L))
    dump("hits_authority_pass", hEdges.join(h0, Seq("src"))
      .groupBy(col("dst")).agg(sum(col("h")).as("ra")))
    val a0 = hEdgesByDst.select(col("dst")).distinct().withColumn("a", lit(1000L))
    dump("hits_hub_pass", hEdgesByDst.join(a0, Seq("dst"))
      .groupBy(col("src")).agg(sum(col("a")).as("rh")))

    // ---- Basket pair-table BUILD (the step the memo shares between
    // q_market_basket and q_part_affinity).
    dump("basket_pairs_build",
      graft.queries.Breadth59.pairTablePlan(Tables.lineitem(spark, dir)))

    spark.stop()
  }
}
