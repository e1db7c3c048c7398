package graft

/** SQL-surface registration of the native expressions via
  * SparkSessionExtensions (graft.GraftExtensions). The shared test session
  * installs the extension through spark.sql.extensions (SparkSpec). */
class ExtensionsSpec extends SparkSpec {

  test("graft_cosine is callable from SQL") {
    val r = spark.sql(
      "SELECT round(graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS c")
      .collect().head.getDouble(0)
    assert(r == 1.0)
  }

  test("graft_shingles is callable from SQL") {
    val r = spark.sql("SELECT graft_shingles('a b c d', 3, false) AS sh")
      .collect().head.getSeq[String](0)
    assert(r == Seq("a b c", "b c d"))
  }

  test("graft_lsh_signatures returns one bucket per table") {
    val r = spark.sql(
      "SELECT graft_lsh_signatures(array(1.0D, -2.0D, 0.5D), 4, 8) AS s")
      .collect().head.getSeq[Long](0)
    assert(r.length == 8)
    assert(r.forall(b => b >= 0 && b < 16))
  }

  test("graft_shingles rejects a non-boolean-literal distinct argument") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles('a b c', 2, 'yes')").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[IllegalArgumentException]),
      s"expected IllegalArgumentException in cause chain, got $e")
  }

  test("qualityFilterScaled (approx_percentile) matches the exact-median " +
    "filter at tight accuracy on the testdata") {
    val exact = SparkEntry.queries("q_quality_filter")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val scaled = graft.queries.Extensions
      .qualityFilterScaled(Tables.documents(spark, sf0001))
      .collect().map(_.toSeq).toSeq
    assert(exact.nonEmpty)
    assert(scaled == exact)
  }
}
