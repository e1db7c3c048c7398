package graft

/** Integration smoke: every registered query runs at sf0.001; every oracle
  * key has a query; entry returns rows (driver t1 check). */
class QueriesSpec extends SparkSpec {

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 and returns rows") {
      val n = fn(spark, sf0001).count()
      // pairwise near-dup queries may legitimately be sparse but must run;
      // everything else must produce rows
      val mayBeEmpty = Set("q_dedup_minhash", "q_ngram_jaccard", "q_simhash",
        "q_embed_neardup")
      assert(n > 0 || mayBeEmpty(name), s"$name returned 0 rows")
    }
  }
}
