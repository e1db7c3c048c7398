package graft

import graft.queries.Breadth61
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the sixty-second wave (Breadth61
  * concentration and impact curves). */
class Wave63Spec extends SparkSpec {
  import spark.implicits._

  test("paretoCurve: a 10-customer geometric book concentrates as the " +
    "hand Lorenz points") {
    // customer k revenue 2^k cents, k=1..10 → top decile = cust 10
    val rows = (1L to 10L).map(k =>
      (k, k, "O", math.pow(2.0, k.toDouble) / 100.0, "2024-01-01 00:00:00", "1"))
    val orders = rows.toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "at", "o_orderpriority")
      .withColumn("o_orderdate", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth61.paretoCurve(orders)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(4))).toSeq
    val total = (1 to 10).map(k => 1L << k).sum // 2046
    // decile 0 = the biggest customer (2^10), cumulative from the top
    assert(got.head === ((0, 1L, 1024L, 1024.0 / total.toDouble)))
    assert(got.last._1 === 9 && got.last._4 === 1.0)
    assert(got.map(_._2).sum === 10L)
  }

  test("impactCurve: big ticks move prices more — bands and ratios by " +
    "hand") {
    // key 1: moves of 1 cent on volume 5 (band 0), 50 cents on volume 25
    // (band 2); first tick has no prev and drops
    val rows = Seq((1L, 100L, 5L), (1L, 101L, 5L), (1L, 102L, 5L),
      (1L, 152L, 25L), (1L, 102L, 25L))
    val df = rows.zipWithIndex.map { case ((k, c, v), i) =>
      (k, c.toDouble / 100.0, i.toLong + 1, f"2024-01-01 ${10 + i}%02d:00:00", v)
    }.toDF("user_id", "value", "event_id", "at", "k")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", concat(lit("{\"k\":"), col("k"), lit("}")))
      .drop("k")
    val got = Breadth61.impactCurve(df, "user_id", "ts", "value",
        "event_id", "k")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === Seq((0, 2L, 2L, 2.0 / 200.0), (2, 2L, 100L, 100.0 / 200.0)))
  }
}
