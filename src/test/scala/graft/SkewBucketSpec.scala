package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

class SkewBucketSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregate equals direct aggregate") {
    val e = Tables.events(spark, sf0001)
    val direct = e.groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select("user_id", "n", "sum_value")
    val salted = Skew.saltedSumCount(e, "user_id", "value", "event_id", 8)
      .select(col("user_id"), col("n"), round(col("sum_value"), 2).as("sum_value"))
    assert(direct.except(salted).count() == 0)
    assert(salted.except(direct).count() == 0)
  }

  test("bucketed tables join without a shuffle exchange") {
    // in-memory catalog forgets tables between JVMs but the warehouse dir
    // survives — drop metadata AND location before (re)creating
    Seq("orders_b", "customer_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    val o = Tables.orders(spark, sf0001)
    val c = Tables.customer(spark, sf0001)
    o.write.mode("overwrite").bucketBy(8, "o_custkey")
      .sortBy("o_custkey").saveAsTable("orders_b")
    c.write.mode("overwrite").bucketBy(8, "c_custkey")
      .sortBy("c_custkey").saveAsTable("customer_b")
    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // co-bucketed join: no shuffle before the join (only the agg shuffles)
    val joinPart = plan.split("HashAggregate").last
    assert(!joinPart.contains("Exchange hashpartitioning(o_custkey") &&
      !joinPart.contains("Exchange hashpartitioning(c_custkey"),
      plan.take(1200))
    // result sanity vs unbucketed join
    val expected = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    assert(joined.orderBy("c_mktsegment").collect().toSeq ==
      expected.orderBy("c_mktsegment").collect().toSeq)
  }
}
