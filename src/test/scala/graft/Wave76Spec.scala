package graft

import graft.queries.Breadth74
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the seventy-fifth wave (Breadth74 Simpson
  * diversity / length quartiles / windowed TTR). */
class Wave76Spec extends SparkSpec {
  import spark.implicits._

  test("simpsonDiversity: hand two-source value; a one-token source " +
    "is unscored") {
    val docs = Seq(("s1", 1L, "a a b"), ("s2", 2L, "x"))
      .toDF("source", "doc_id", "text")
    val got = Breadth74.simpsonDiversity(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    // s1: counts a=2, b=1; N=3 -> 1 - (2·1 + 0)/(3·2) = 1 - 2/6
    assert(got === Seq(
      ("s1", 3L, 2L, Some(1.0 - 2.0 / 6.0)),
      ("s2", 1L, 1L, None)))
  }

  test("lengthQuartiles: exact rank selection on 4 and 5 docs") {
    val docs = Seq(("s1", 1L, 10L), ("s1", 2L, 20L), ("s1", 3L, 30L),
      ("s1", 4L, 40L),
      ("s2", 5L, 1L), ("s2", 6L, 2L), ("s2", 7L, 3L), ("s2", 8L, 4L),
      ("s2", 9L, 5L)).toDF("source", "doc_id", "n_chars")
    val got = Breadth74.lengthQuartiles(docs, "source", "n_chars",
        "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // n=4: ranks ceil(1)=1, ceil(2)=2, ceil(3)=3 -> 10,20,30
    // n=5: ranks ceil(1.25)=2, ceil(2.5)=3, ceil(3.75)=4 -> 2,3,4
    assert(got === Seq(("s1", 4L, 10L, 20L, 30L),
      ("s2", 5L, 2L, 3L, 4L)))
  }

  test("ttrWindow: the slice caps the window and distinct counts " +
    "types; w=3 hand check") {
    val docs = Seq((1L, "a b a b c"), (2L, "x x")).toDF("doc_id", "text")
    val got = Breadth74.ttrWindow(docs, "doc_id", "text", w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // doc1 first 3 tokens: a b a -> 2 types; doc2: x x -> 1 type
    assert(got === Seq((1L, 3L, 2L, 2.0 / 3.0), (2L, 2L, 1L, 0.5)))
  }
}
