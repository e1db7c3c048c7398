package graft

import graft.queries.Breadth115
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-sixteenth wave (Breadth115 seasonality /
  * spend quantiles / discount effect). */
class Wave121Spec extends SparkSpec {
  import spark.implicits._

  test("typeSeasonality: cross-multiplied month share index") {
    val part = Seq((1L, "A")).toDF("p_partkey", "p_type")
    // qty 30 in Jan, 10 in Feb → indices 12·30/40 = 9, 12·10/40 = 3
    val li = Seq((1L, "2024-01-05", 30.0), (1L, "2024-02-05", 10.0))
      .toDF("l_partkey", "at", "l_quantity")
      .withColumn("l_shipdate", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth115.typeSeasonality(part, li)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === Seq((1L, 30L, 9.0), (2L, 10L, 3.0)))
  }

  test("spendQuantileTrend: rank-exact monthly p50/p90") {
    val orders = (1 to 10).map(i =>
      (i.toLong, f"2024-01-$i%02d", i.toDouble))
      .toDF("o_orderkey", "at", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp_ntz(col("at"))).drop("at")
    val r = Breadth115.spendQuantileTrend(orders).collect()(0)
    assert(r.getLong(1) === 10L)
    assert(r.getDouble(2) === 5.0 && r.getDouble(3) === 9.0)
  }

  test("discountEffect: exact per-level volume and revenue share") {
    val li = Seq((10.0, 2.0, 0.0), (20.0, 4.0, 0.1))
      .toDF("l_extendedprice", "l_quantity", "l_discount")
    val got = Breadth115.discountEffect(li)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    // rev: 1000·100 = 100000 (10.00) and 2000·90 = 180000 (18.00)
    assert(got === Seq(
      (0L, 1L, 2.0, 10.0, 100000.0 / 280000.0),
      (10L, 1L, 4.0, 18.0, 180000.0 / 280000.0)))
  }
}
