package graft

import graft.queries.Breadth63
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the sixty-fourth wave (Breadth63 Zipf fit
  * and ABC classification). */
class Wave65Spec extends SparkSpec {
  import spark.implicits._

  test("zipfSlope: an exactly-Zipfian corpus (f = 12/r) fits slope -1") {
    // token frequencies 12, 6, 4, 3 at ranks 1..4 → ln f = ln 12 - ln r.
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = Breadth63.zipfSlope(docs, k = 200).collect().head
    assert(got.getLong(0) === 4L)
    assert(math.abs(got.getDouble(1) - (-1.0)) < 1e-4)
    assert(math.abs(got.getDouble(2) - math.log(12.0)) < 1e-3)
  }

  test("abcClass: hand 80/15/5 revenue split lands one part per class " +
    "(boundary shares class A at exactly 0.80)") {
    val rows = Seq((1L, 0.008, 0.0), (2L, 0.0015, 0.0), (3L, 0.0005, 0.0))
    val li = rows.toDF("l_partkey", "l_extendedprice", "l_discount")
    val got = Breadth63.abcClass(li)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === Seq(("A", 1L, 80L, 0.80), ("B", 1L, 15L, 0.15),
      ("C", 1L, 5L, 0.05)))
  }
}
