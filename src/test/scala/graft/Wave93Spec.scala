package graft

import graft.queries.Breadth90
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the ninety-first wave (Breadth90 backlog
  * aging / fill rate / ABC-XYZ). */
class Wave93Spec extends SparkSpec {
  import spark.implicits._

  private def ts(c: org.apache.spark.sql.Column) = to_timestamp_ntz(c)

  test("backlogAging: only pre-snapshot orders with post-snapshot lines " +
    "age into buckets, open revenue exact") {
    val orders = Seq(
      (1L, "1997-11-15"), // age 47 -> 31-60
      (2L, "1997-12-20"), // age 12 -> 0-30
      (3L, "1998-02-01"), // post-snapshot -> out
      (4L, "1997-01-01")) // no open lines -> out
      .toDF("o_orderkey", "at")
      .withColumn("o_orderdate", ts(col("at"))).drop("at")
    val lineitem = Seq(
      (1L, "1998-02-01", 10.00, 0.10), // open 9.00
      (1L, "1997-12-01", 99.00, 0.00), // shipped
      (2L, "1998-01-05", 2.00, 0.00),  // open 2.00
      (3L, "1998-03-01", 7.00, 0.00),
      (4L, "1997-02-01", 7.00, 0.00))  // shipped
      .toDF("l_orderkey", "at", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", ts(col("at"))).drop("at")
    val got = Breadth90.backlogAging(orders, lineitem)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === Seq(("0-30", 1L, 1L, 2.0), ("31-60", 1L, 1L, 9.0)))
  }

  test("fillRate: worst line lag gates the order; weekly share and " +
    "mean worst-lag are exact") {
    val orders = Seq(
      (1L, "2024-01-01"), (2L, "2024-01-03"), (3L, "2024-01-08"))
      .toDF("o_orderkey", "at")
      .withColumn("o_orderdate", ts(col("at"))).drop("at")
    val lineitem = Seq(
      (1L, "2024-01-05"), (1L, "2024-01-10"), // maxlag 9 -> filled
      (2L, "2024-02-01"),                     // lag 29 -> late
      (3L, "2024-01-09"))                     // lag 1 -> filled
      .toDF("l_orderkey", "at")
      .withColumn("l_shipdate", ts(col("at"))).drop("at")
    val got = Breadth90.fillRate(orders, lineitem)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq
    assert(got === Seq(
      ("2024-01-01", 2L, 1L, 0.5, 19.0),
      ("2024-01-08", 1L, 1L, 1.0, 1.0)))
  }

  test("abcXyz: revenue cumshare classes cross demand-variability " +
    "classes on exact integer comparisons") {
    // p1: 80% rev, steady (X); p2: 15%, cv in [0.5,1) (Y);
    // p3: 5%, cv >= 1 across three active months (Z)
    val lineitem = Seq(
      (1L, "1995-01-10", 10.0, 40.00), (1L, "1995-02-10", 10.0, 40.00),
      (2L, "1995-01-15", 1.0, 10.00), (2L, "1995-02-15", 9.0, 5.00),
      (3L, "1995-01-20", 1.0, 2.00), (3L, "1995-02-20", 1.0, 2.00),
      (3L, "1995-03-20", 10.0, 1.00))
      .toDF("l_partkey", "at", "l_quantity", "l_extendedprice")
      .withColumn("l_discount", lit(0.0))
      .withColumn("l_shipdate", ts(col("at"))).drop("at")
    val got = Breadth90.abcXyz(lineitem)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === Seq(("A", "X", 1L, 80.0), ("B", "Y", 1L, 15.0),
      ("C", "Z", 1L, 5.0)))
  }
}
