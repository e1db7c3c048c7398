package graft

import graft.queries.Breadth48

/** Closed-form fixtures for the forty-ninth wave (Breadth48 corpus
  * novelty). */
class Wave48Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("novelty: a verbatim copy scores 0, a half-overlapping doc 0.5, " +
    "the first doc 1") {
    val got = Breadth48.novelty(docs(
        (1L, "a b c d", "s1"),
        (2L, "a b c d", "s1"),
        (3L, "a b c x", "s1")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // doc1: {abc, bcd} both first → 1; doc2: same set, nothing first → 0;
    // doc3: {abc, bcx} — bcx first → 0.5
    assert(got === Seq((1L, 2L, 2L, 1.0), (2L, 2L, 0L, 0.0),
      (3L, 2L, 1L, 0.5)))
  }

  test("sourceRedundancy: duplicated source halves to redundancy 0.5, " +
    "a singleton source is 0") {
    val got = Breadth48.sourceRedundancy(docs(
        (1L, "a b c d", "dup"),
        (2L, "a b c d", "dup"),
        (3L, "p q r s", "solo")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got === Seq(("dup", 2L, 4L, 2L, 0.5),
      ("solo", 1L, 2L, 2L, 0.0)))
  }
}
