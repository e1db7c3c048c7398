package graft

import java.nio.file.Files
import graft.ops.Ingest
import graft.sources.{Sinks, Sources}
import org.apache.spark.sql.functions._

class SourceSinkSpec extends SparkSpec {
  import spark.implicits._

  test("JSON payload source projects known fields, ignores extras, nulls missing") {
    val payload =
      """[
        |{"symbol":"BTC","name":"Bitcoin","current_price":50000.5,
        | "market_cap":1e12,"total_volume":2e10,"image":"x.png","rank":1},
        |{"symbol":"ETH","name":"Ether","current_price":3000.25}
        |]""".stripMargin
    val out = Sources.quotesFromJsonPayload(spark, payload)
    assert(out.schema.fieldNames.toSeq ==
      Seq("symbol", "name", "current_price", "market_cap", "total_volume"))
    val rows = out.orderBy("symbol").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "BTC" && rows(0).getDouble(2) == 50000.5)
    assert(rows(1).isNullAt(3) && rows(1).isNullAt(4)) // missing → null
  }

  test("source → shape → partitioned sink → pruned scan round-trips") {
    val payload =
      """[{"symbol":"BTC","name":"Bitcoin","current_price":1.0},
        |{"symbol":"eth","name":"Ether","current_price":2.0}]""".stripMargin
    val shaped = Ingest.shapeBatch(
      Sources.quotesFromJsonPayload(spark, payload),
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    val dir = Files.createTempDirectory("graft_sink").toString + "/prices"
    Sinks.appendDatePartitioned(shaped, dir, "timestamp")
    // second tick lands in a different partition
    Sinks.appendDatePartitioned(
      Ingest.shapeBatch(Sources.quotesFromJsonPayload(spark, payload),
        java.sql.Timestamp.valueOf("2024-02-02 00:00:00")), dir, "timestamp")
    val back = spark.read.parquet(dir)
    assert(back.count() == 4)
    val oneDay = back.filter(col("event_date") === lit("2024-02-01"))
    assert(oneDay.count() == 2)
    // the date filter must prune partitions, not just filter rows
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"), plan.take(500))
  }
}
