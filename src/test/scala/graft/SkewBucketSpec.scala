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

  test("AQE splits a skewed join partition at runtime (skew=true in the " +
    "final plan) — the no-code-change path for hot keys") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k ->
      util.Try(spark.conf.get(k)).toOption.filter(_ != null)).toMap
    try {
      // tiny thresholds so the fixture's hot key registers as skew, and
      // broadcast disabled so the join actually shuffles (SMJ)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 50k rows on ONE key vs 100 uniform keys, joined to a key table;
      // the aggregate consumes `pad` so column pruning cannot shrink the
      // hot shuffle partition below the skew threshold
      val hot = spark.range(50000).select(lit(1L).as("k"),
          concat(lit("payload_payload_payload_"), col("id")).as("pad"))
        .unionAll(spark.range(2000).select((col("id") % 100 + 2).as("k"),
          concat(lit("p"), col("id")).as("pad")))
      val dim = spark.range(200).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("dv"))
      // GLOBAL aggregate after the join: a per-key aggregate would
      // require the join's hash distribution, and AQE (rightly) refuses
      // to split a skewed partition when that forces an extra shuffle —
      // so this pins the pure skew-split decision
      val joined = hot.join(dim, "k")
        .agg(count(lit(1)).as("n"), max(length(col("pad"))).as("max_pad"))
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${finalPlan.take(1000)}")
    } finally prev.foreach { case (k, v) =>
      v match { case Some(x) => spark.conf.set(k, x); case None => spark.conf.unset(k) }
    }
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
