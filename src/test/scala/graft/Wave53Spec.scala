package graft

import graft.queries.Breadth53

/** Closed-form fixtures for the fifty-fourth wave (Breadth53 quality
  * rules gate). */
class Wave53Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, text) => (id, text, "en", "s", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private val good = (1 to 25).map(i => f"w$i%03d").mkString(" ")
  private val short = (1 to 10).map(i => f"w$i%03d").mkString(" ")
  private val long = (1 to 95).map(i => f"w$i%03d").mkString(" ")
  private val repeat =
    (Seq.fill(10)("spam") ++ (1 to 20).map(i => f"w$i%03d")).mkString(" ")
  private val tiny = (0 until 30)
    .map(i => s"${('a' + i / 10).toChar}${i % 10}").mkString(" ")

  test("ruleTable: each crafted doc trips exactly its rule; the clean " +
    "doc keeps") {
    val got = Breadth53.ruleTable(docs(
        (1L, good), (2L, short), (3L, long), (4L, repeat), (5L, tiny)))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))).toSeq
    assert(got === Seq(
      (1L, false, false, false, false, true), // keeps
      (2L, true, false, false, false, false), // short
      (3L, false, true, false, false, false), // long
      (4L, false, false, false, true, false), // repeat
      (5L, false, false, true, false, false))) // word len
  }

  test("ruleAttrition: sole-reason counts isolate each rule's marginal " +
    "value") {
    val got = Breadth53.ruleAttrition(Breadth53.ruleTable(docs(
        (1L, good), (2L, short), (3L, long), (4L, repeat), (5L, tiny))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got === Seq(("r_long", 1L, 1L), ("r_repeat", 1L, 1L),
      ("r_short", 1L, 1L), ("r_word_len", 1L, 1L)))
  }
}
