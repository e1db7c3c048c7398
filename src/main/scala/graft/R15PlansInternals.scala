package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Round-15 plan evidence: the global approximate directed top-k DAG
  * (graft.sim.ProjGraph.approxDirectedTopK — the build behind
  * chain_global_mutual and its 8 consumers). The facade queries plan as
  * memo-store scans, so the expansion/rank shape the round changed
  * (seed-pair anti-join + checkpoint removed, one-pass direction
  * explode) is only visible on the direct API. The eager seedTop
  * checkpoint executes during the dump (sf0.001, seconds); the final
  * plan shows everything downstream of it — in particular the presence
  * (before) / absence (after) of the left-anti join against the
  * seed-pair frame. Args: outDir suffix [sfDir]. */
object R15PlansInternals {
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
    dump("gm_approx_topk", graft.sim.ProjGraph.approxDirectedTopK(
      Tables.embeddings(spark, dir), 4))
    spark.stop()
  }
}
