package graft

import graft.queries.Breadth87

/** Closed-form fixtures for the eighty-eighth wave (Breadth87 RAKE /
  * language trigrams / token Gini). */
class Wave90Spec extends SparkSpec {
  import spark.implicits._

  test("rakeKeywords: stopword-split phrases score deg/freq sums; " +
    "equal scores tie-break by phrase") {
    val docs = Seq(
      (1L, "red apple and green apple"),
      (2L, "red apple"))
      .toDF("doc_id", "text")
    // phrases: "red apple" x2, "green apple" x1; every word ratio = 2
    // -> every phrase scores 4.0
    val got = Breadth87.rakeKeywords(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === Seq(("green apple", 2L, 1L, 4.0),
      ("red apple", 2L, 2L, 4.0)))
  }

  test("rakeKeywords: a doc of only stopwords contributes no phrases") {
    val docs = Seq((1L, "the of and"), (2L, "plain words"))
      .toDF("doc_id", "text")
    val got = Breadth87.rakeKeywords(docs, "doc_id", "text")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("plain words"))
  }

  test("langTrigrams: counts pool per language, rank tie-breaks by gram") {
    val docs = Seq(
      ("xx", "aaaa"), // grams aaa, aaa
      ("xx", "abab")) // grams aba, bab
      .toDF("lang", "text")
    val got = Breadth87.langTrigrams(docs, "lang", "text")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got === Seq(("xx", 1, "aaa", 2L), ("xx", 2, "aba", 1L),
      ("xx", 3, "bab", 1L)))
  }

  test("tokenGini: hand Lorenz over an a,a,a,b source gives 0.25") {
    val docs = Seq(("s1", "a a a b")).toDF("source", "text")
    val r = Breadth87.tokenGini(docs, "source", "text").collect()(0)
    assert(r.getLong(1) === 2L && r.getLong(2) === 4L)
    assert(r.getDouble(3) === 0.25)
  }

  test("tokenGini: a uniform distribution scores the exact small-n " +
    "uniform Gini (n-1)/(2n) shy of zero only by discreteness") {
    // counts 1,1 -> T = 1 + 2 = 3; G = 6/(2*2) - 3/2 = 0
    val docs = Seq(("s1", "a b")).toDF("source", "text")
    val r = Breadth87.tokenGini(docs, "source", "text").collect()(0)
    assert(r.getDouble(3) === 0.0)
  }
}
