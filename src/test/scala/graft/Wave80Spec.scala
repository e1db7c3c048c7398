package graft

import graft.queries.Breadth77

/** Closed-form fixtures for the seventy-eighth wave (Breadth77 dedup
  * inflation / prefix templates / char classes). */
class Wave80Spec extends SparkSpec {
  import spark.implicits._

  test("dupInflation: duplicate texts count once in the unique tier") {
    val docs = Seq(
      ("s1", 1L, "a b c"), ("s1", 2L, "a b c"), ("s1", 3L, "x y"),
      ("s2", 4L, "k")).toDF("source", "doc_id", "text")
    val got = Breadth77.dupInflation(docs, "source", "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got === Seq(
      ("s1", 3L, 2L, 8L, 5L, 8.0 / 5.0),
      ("s2", 1L, 1L, 1L, 1L, 1.0)))
  }

  test("prefixDup: shared 5-token starts cluster; short docs compare " +
    "their full text") {
    val docs = Seq(
      ("s1", 1L, "the quick brown fox jumps high"),
      ("s1", 2L, "the quick brown fox jumps low"),
      ("s1", 3L, "entirely different text here now"),
      ("s2", 4L, "hi"), ("s2", 5L, "hi")).toDF("source", "doc_id", "text")
    val got = Breadth77.prefixDup(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got === Seq(
      ("s1", 3L, 1L, 2L, 2.0 / 3.0),
      ("s2", 2L, 1L, 2L, 1.0)))
  }

  test("charClasses: exact letter/digit/space/other shares") {
    val docs = Seq(("s1", 1L, "ab 12!"), ("s1", 2L, "c")) // 7 chars
      .toDF("source", "doc_id", "text")
    val r = Breadth77.charClasses(docs, "source", "text").collect()(0)
    assert(r.getLong(1) === 7L)
    assert(r.getDouble(2) === 3.0 / 7.0) // a b c
    assert(r.getDouble(3) === 2.0 / 7.0) // 1 2
    assert(r.getDouble(4) === 1.0 / 7.0) // one space
    assert(r.getDouble(5) === 1.0 / 7.0) // !
  }
}
