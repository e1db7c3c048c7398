package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Round-14 plan-evidence dumper: writes `<outDir>/<query>_<suffix>.txt`
  * with the formatted physical plan of each named query — the
  * before/after artifacts the optimization round commits under
  * plans/r14/. Args: outDir suffix q_a,q_b,... [sfDir]. Runs on the
  * PlanDump session shape (local[4], sf0.001 by default) so before and
  * after files are comparable across trees. */
object R14Plans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val keys = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, dir)
      val txt = s"# $k ($suffix) — explain(formatted), $dir, local[4]\n\n" +
        df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim + "\n"
      Files.writeString(Paths.get(outDir, s"${k}_$suffix.txt"), txt)
      println(s"wrote ${k}_$suffix.txt")
    }
    spark.stop()
  }
}
