package graft

import graft.queries.Breadth149
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-fiftieth wave (Breadth149 Neyman
  * allocation). */
class Wave158Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, Long)]) =
    rows.toDF("doc_id", "source", "n_chars")
      .withColumn("text", lit("x")).withColumn("lang", lit("en"))

  test("hand case: weights 10 vs 30 split the budget 25/75 exactly") {
    // A: {0,10} -> varnum = 2*100 - 100 = 100, w = 10
    // B: {0,30} -> varnum = 2*900 - 900 = 900, w = 30
    val d = docs(Seq((1L, "a", 0L), (2L, "a", 10L),
      (3L, "b", 0L), (4L, "b", 30L)))
    val got = Breadth149.neyman(d).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("alloc")).toMap
    assert(got == Map("a" -> 25L, "b" -> 75L))
  }

  test("largest-remainder top-up: equal weights, remainder goes to " +
    "the lexicographically smallest source") {
    val d = docs(Seq(
      (1L, "a", 0L), (2L, "a", 10L),
      (3L, "b", 0L), (4L, "b", 10L),
      (5L, "c", 0L), (6L, "c", 10L)))
    val got = Breadth149.neyman(d).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("alloc")).toMap
    assert(got("a") == 34L && got("b") == 33L && got("c") == 33L)
    assert(got.values.sum == 100L)
  }

  test("a zero-variance stratum gets zero allocation") {
    val d = docs(Seq(
      (1L, "flat", 7L), (2L, "flat", 7L), (3L, "flat", 7L),
      (4L, "vary", 0L), (5L, "vary", 50L)))
    val got = Breadth149.neyman(d).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("alloc")).toMap
    assert(got("flat") == 0L && got("vary") == 100L)
  }

  test("sf0.001: allocations sum to the budget and Neyman is at least " +
    "as efficient as proportional") {
    val d = Tables.documents(spark, sf0001)
    val al = Breadth149.neyman(d).collect()
    assert(al.length == 20)
    assert(al.map(_.getAs[Long]("alloc")).sum == 100L)
    val eff = Breadth149.neymanEfficiency(d).collect().head
    assert(eff.getAs[Double]("efficiency") >= 1.0 - 1e-9,
      s"Cauchy-Schwarz: ${eff.getAs[Double]("efficiency")}")
    assert(eff.getAs[Double]("var_neyman") > 0.0)
  }
}
