package graft

import graft.queries.Breadth111
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-twelfth wave (Breadth111 vendor CV /
  * Granger-lite / price stickiness). */
class Wave116Spec extends SparkSpec {
  import spark.implicits._

  test("vendorConsistency ranks by the cross-multiplied CV²") {
    val supplier = Seq((10L, "S_X"), (11L, "S_Y"))
      .toDF("s_suppkey", "s_name")
    val orders = Seq(Tuple1(1L)).toDF("o_orderkey")
      .withColumn("o_orderdate", to_timestamp_ntz(lit("2024-01-01")))
    // supp 10 delays {10, 30}: mean 20, sd √200; supp 11 {19, 21}
    val li = Seq((1L, 10L, "2024-01-11"), (1L, 10L, "2024-01-31"),
      (1L, 11L, "2024-01-20"), (1L, 11L, "2024-01-22"))
      .toDF("l_orderkey", "l_suppkey", "at")
      .withColumn("l_shipdate", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth111.vendorConsistency(supplier, orders, li)
      .collect()
    assert(got(0).getLong(0) === 10L)
    assert(got(0).getDouble(3) === 20.0)
    assert(got(0).getDouble(4) === math.sqrt(200.0))
    assert(got(1).getLong(0) === 11L)
  }

  test("grangerLite: a key that follows the lagged market gets a " +
    "positive market coefficient") {
    // key 1 mirrors key 2's previous move: x1_t = x2_{t-1} pattern
    val c2 = Seq(100, 200, 150, 300, 220, 400, 310, 500)
    // key 1 closes: cumulative of lagged key-2 moves (arbitrary seed)
    val m2 = c2.sliding(2).map(p => p(1) - p(0)).toSeq
    val c1 = m2.dropRight(1).scanLeft(1000)(_ + _)
    val e = (c2.zipWithIndex.map { case (c, i) =>
      (2L, (100 + i).toLong, f"2024-01-${i + 1}%02d 10:00:00",
        c.toDouble / 100.0) } ++
      c1.zipWithIndex.map { case (c, i) =>
        (1L, (200 + i).toLong, f"2024-01-${i + 2}%02d 10:00:00",
          c.toDouble / 100.0) })
      .toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth111.grangerLite(e, "user_id", "ts", "value",
      "event_id").collect()
    val k1 = got.find(_.getLong(0) == 1L).get
    assert(!k1.isNullAt(3)) // market-lag coefficient estimable
  }

  test("priceStickiness: dollar-grain zero runs counted exactly") {
    // dollar closes 1,1,1,2,2 → moves 0,0,+1,0 → 3 zeros in 2 runs
    val e = Seq(1.00, 1.20, 1.40, 2.10, 2.90).zipWithIndex.map {
      case (v, i) => (1L, i.toLong, f"2024-01-${i + 1}%02d 10:00:00", v)
    }.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val r = Breadth111.priceStickiness(e, "user_id", "ts", "value",
      "event_id").collect()(0)
    assert(r.getLong(1) === 4L && r.getLong(2) === 3L)
    assert(r.getDouble(3) === 0.75)
    assert(r.getDouble(4) === 1.5)
  }
}
