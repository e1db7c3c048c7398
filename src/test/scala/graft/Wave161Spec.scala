package graft

import graft.queries.Breadth152
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-fifty-third wave (Breadth152 dataset
  * card). */
class Wave161Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String, String)]) =
    rows.toDF("doc_id", "source", "lang", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("hand card: counts, dup rate, short share, lower median") {
    val long = (1 to 25).map("w" + _).mkString(" ")
    val d = docs(Seq(
      (1L, "s0", "en", long), (2L, "s0", "en", long), // exact dupes
      (3L, "s1", "de", "a b c"),
      (4L, "s1", "en", "x y")))
    val got = Breadth152.datasetCard(d).collect().head
    assert(got.getAs[Long]("n_docs") == 4L)
    assert(got.getAs[Long]("n_tokens") == 25L + 25L + 3L + 2L)
    assert(got.getAs[Long]("n_sources") == 2L)
    assert(got.getAs[Long]("n_langs") == 2L)
    assert(got.getAs[Double]("dup_rate") == 1.0 - 3.0 / 4.0)
    assert(got.getAs[Double]("short_share") == 0.5)
    // token counts sorted: 2, 3, 25, 25 -> lower median (k=2) = 3
    assert(got.getAs[Long]("median_tokens") == 3L)
  }

  test("per-lang cards: medians computed within language") {
    val d = docs(Seq(
      (1L, "s0", "en", "a"), (2L, "s0", "en", "a b"),
      (3L, "s0", "en", "a b c"),
      (4L, "s0", "de", "x y z w v")))
    val got = Breadth152.datasetCardByLang(d).collect()
      .map(r => r.getAs[String]("lang") ->
        r.getAs[Long]("median_tokens")).toMap
    assert(got == Map("en" -> 2L, "de" -> 5L))
  }

  test("sf0.001: the global card is consistent with the per-lang " +
    "decomposition") {
    val d = Tables.documents(spark, sf0001)
    val g = Breadth152.datasetCard(d).collect().head
    val per = Breadth152.datasetCardByLang(d).collect()
    assert(g.getAs[Long]("n_docs") == 500L)
    assert(per.map(_.getAs[Long]("n_docs")).sum == 500L)
    assert(per.map(_.getAs[Long]("n_tokens")).sum ==
      g.getAs[Long]("n_tokens"))
    assert(per.length == g.getAs[Long]("n_langs"))
    assert(g.getAs[Double]("dup_rate") >= 0.0)
  }
}
