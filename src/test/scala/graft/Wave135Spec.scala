package graft

import graft.queries.Breadth128
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-twenty-ninth wave (Breadth128 distinctive
  * tokens + vocabulary overlap). */
class Wave135Spec extends SparkSpec {
  import spark.implicits._

  test("distinctiveTokens: a class-exclusive token outranks a shared " +
    "one; under-represented tokens go negative") {
    // lang a: 'zz' exclusive (6×) + 'common' (6×); lang b: 'common' 12×
    val docs = Seq(
      (1L, "a", ("zz " * 6 + "common " * 6).trim),
      (2L, "b", ("common " * 12).trim))
      .toDF("doc_id", "lang", "text")
    val got = Breadth128.distinctiveTokens(docs).collect()
    val aTop = got.filter(r => r.getString(0) == "a" && r.getInt(1) == 1)
      .head
    assert(aTop.getString(2) === "zz")
    // zz: tf=6, T=24, Tc=12, ta=6 → 6·12 − 0·12 = 72
    assert(aTop.getLong(4) === 72L)
    // 'common' in lang a: 6·12 − 12·12 = −72 (under-represented)
    val aCommon = got.filter(r => r.getString(0) == "a" &&
      r.getString(2) == "common").head
    assert(aCommon.getLong(4) === -72L)
  }

  test("vocabOverlap: exact Jaccard of distinct token sets") {
    val docs = Seq(
      (1L, "a", "x y z"),
      (2L, "b", "y z w"),
      (3L, "c", "q"))
      .toDF("doc_id", "lang", "text")
    val got = Breadth128.vocabOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(4), r.getDouble(5))).toMap
    assert(got(("a", "b")) === ((2L, 0.5)))   // {y,z} of {x,y,z,w}
    assert(got.get(("a", "c")).isEmpty)       // no shared token → no row
    assert(got.size === 1)
  }
}
