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

  test("WeightedMean typed Aggregator (udaf surface) matches the built-in " +
    "sum(v*w)/sum(w) hot path of q_typed_agg") {
    import org.apache.spark.sql.functions._
    val wm = udaf(graft.functions.WeightedMean)
    val base = Tables.events(spark, sf0001)
      .select(col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast("double").as("w"))
      .filter(col("w").isNotNull)
    val viaUdaf = base.groupBy(col("event_type"))
      .agg(round(wm(col("value"), col("w")), 4).as("wmean"))
      .orderBy(col("event_type").asc)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val viaBuiltin = base.groupBy(col("event_type"))
      .agg(round(sum(col("value") * col("w")) / sum(col("w")), 4).as("wmean"))
      .orderBy(col("event_type").asc)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(viaUdaf.sameElements(viaBuiltin))
  }
}
