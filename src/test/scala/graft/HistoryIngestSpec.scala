package graft

import java.sql.Timestamp
import graft.ops.{History, Ingest}
import org.apache.spark.sql.functions._

class HistoryIngestSpec extends SparkSpec {
  import spark.implicits._

  test("inclusive end day: rows on the end date stay, next-day midnight is out") {
    val df = Seq(
      (1L, "2024-01-04 23:59:59.999"),
      (2L, "2024-01-05 00:00:00.000"),
      (3L, "2024-01-20 23:59:59.999"),
      (4L, "2024-01-21 00:00:00.000")
    ).toDF("id", "s").withColumn("ts", to_timestamp_ntz(col("s")))
    val kept = df.filter(History.inclusiveDayRange(col("ts"), "2024-01-05", "2024-01-20"))
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L)) // off-by-one trap of api/server.js:113-124
  }

  test("shapeBatchWithRejects quarantines invalid rows with reasons") {
    val raw = Seq(
      (Some("BTC"), Some("Bitcoin"), Some(1.0)),
      (None, Some("X"), Some(1.0)),
      (Some("Y"), None, Some(1.0)),
      (Some("Z"), Some("Zed"), None)
    ).toDF("symbol", "name", "current_price")
      .withColumn("market_cap", lit(null).cast("double"))
      .withColumn("total_volume", lit(null).cast("double"))
    val (ok, rejects) = Ingest.shapeBatchWithRejects(raw,
      Timestamp.valueOf("2024-02-01 00:00:00"))
    assert(ok.count() == 1)
    val reasons = rejects.select("reject_reason").as[String].collect().sorted
    assert(reasons.toSeq == Seq("null_name", "null_price", "null_symbol"))
  }

  test("ingest shaping drops invalid rows, lowercases key, stamps batch ts") {
    val raw = Seq(
      (Some("BTC"), Some("Bitcoin"), Some(50000.0), Some(1e9), Some(2e7)),
      (None, Some("NoSymbol"), Some(1.0), None, None),        // dropped: null key
      (Some("ETH"), None, Some(3000.0), None, None),          // dropped: null name
      (Some("DOGE"), Some("Doge"), None, Some(1.0), Some(1.0)), // dropped: null price
      (Some("XRP"), Some("Ripple"), Some(0.5), None, None)    // kept: null caps OK
    ).toDF("symbol", "name", "current_price", "market_cap", "total_volume")
    val ts = Timestamp.valueOf("2024-02-01 00:00:00")
    val out = Ingest.shapeBatch(raw, ts)
    assert(out.count() == 2)
    val syms = out.select("symbol").as[String].collect().sorted
    assert(syms.toSeq == Seq("btc", "xrp"))
    // batch-constant timestamp (etl/crypto_etl.py:82) — one distinct value
    assert(out.select("timestamp").distinct().count() == 1)
  }
}
