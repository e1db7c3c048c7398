package graft

import graft.queries.Breadth57

/** Closed-form fixtures for the fifty-eighth wave (Breadth57 lang-ID
  * evaluation). */
class Wave58Spec extends SparkSpec {
  import spark.implicits._

  // 'the'/'of' are en markers, 'der'/'und' de markers (Text.langMarkers)
  private def docs(rows: (Long, String, String)*) =
    rows.map { case (id, text, lang) => (id, text, lang, "s", 1L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private val corpus = docs(
    (1L, "the cat of note", "en"), // en predicted en
    (2L, "der hund und so", "de"), // de predicted de
    (3L, "der die thing x", "en"), // en doc full of de markers → de
    (4L, "zzz qqq", "en")) // no markers → 'und', an en doc missed

  test("langConfusion: the miss and the und fallback land off-diagonal") {
    val got = Breadth57.langConfusion(corpus)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(got === Seq(
      ("de", "de", 1L, true), ("en", "de", 1L, false),
      ("en", "en", 1L, true), ("en", "und", 1L, false)))
  }

  test("langPrf: precision/recall from the same hand matrix; 'und' has " +
    "null recall as a never-true code") {
    val got = Breadth57.langPrf(corpus)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toSeq
    assert(got === Seq(
      ("de", 1L, 2L, 1L, Some(0.5), Some(1.0)),
      ("en", 3L, 1L, 1L, Some(1.0), Some(1.0 / 3.0)),
      ("und", 0L, 1L, 0L, Some(0.0), None)))
  }
}
