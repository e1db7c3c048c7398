package graft

import graft.queries.Breadth151
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-fifty-second wave (Breadth151 k-anonymity
  * + l-diversity). */
class Wave160Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String, Long)]) =
    rows.toDF("doc_id", "source", "lang", "n_chars")
      .withColumn("text", lit("x"))

  test("a singleton class forces k = 1 and lands in the '1' bucket") {
    // 10 docs, one source: ranks 1..10, deciles 0..9 -> every class
    // is a singleton
    val d = docs((1L to 10L).map(i => (i, "s", "en", i * 10)))
    val got = Breadth151.kAnonymity(d).collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("size_bucket") == "1")
    assert(got.head.getAs[Long]("n_classes") == 10L)
    assert(got.head.getAs[Long]("k_anonymity") == 1L)
  }

  test("identical lengths pool into one class: k = n, and one lang " +
    "means l = 1 with full disclosure") {
    val d = docs((1L to 8L).map(i => (i, "s", "en", 100L)))
    // all 8 rows share rank-bucket spread 0..9? ranks 1..8 ->
    // deciles ((r-1)*10) div 8 = 0,1,2,3,5,6,7,8 -> singletons!
    // ties on n_chars break by doc_id so classes stay singletons;
    // the class key is (source, decile) - 8 classes of size 1
    val ka = Breadth151.kAnonymity(d).collect()
    assert(ka.head.getAs[Long]("k_anonymity") == 1L)
    val ld = Breadth151.lDiversity(d).collect().head
    assert(ld.getAs[Long]("l_diversity") == 1L)
    assert(ld.getAs[Double]("disclosed_share") == 1.0)
  }

  test("two langs per class give l = 2 and zero disclosure") {
    // 20 docs, 2 per decile cell with alternating langs
    val d = docs((1L to 20L).map { i =>
      (i, "s", if (i % 2 == 0) "en" else "de", (i + 1) / 2 * 10)
    })
    val ld = Breadth151.lDiversity(d).collect().head
    assert(ld.getAs[Long]("l_diversity") == 2L)
    assert(ld.getAs[Long]("n_disclosed") == 0L)
    val ka = Breadth151.kAnonymity(d).collect()
      .map(r => r.getAs[String]("size_bucket") ->
        r.getAs[Long]("n_classes")).toMap
    assert(ka == Map("2-4" -> 10L))
  }

  test("sf0.001: histogram rows partition the corpus and k/l are " +
    "consistent minima") {
    val d = Tables.documents(spark, sf0001)
    val ka = Breadth151.kAnonymity(d).collect()
    assert(ka.map(_.getAs[Long]("n_rows")).sum == 500L)
    val k = ka.head.getAs[Long]("k_anonymity")
    assert(k >= 1L)
    if (k > 1) assert(!ka.exists(_.getAs[String]("size_bucket") == "1"))
    val ld = Breadth151.lDiversity(d).collect().head
    assert(ld.getAs[Long]("l_diversity") >= 1L)
    val sh = ld.getAs[Double]("disclosed_share")
    assert(sh >= 0.0 && sh <= 1.0)
  }
}
