package graft

import graft.queries.{Extensions, Extensions6}
import org.apache.spark.sql.functions._

/** Edge-case semantics for the crawl-cleaning wave: the closed-form
  * oracle premises (tag-free corpus text, template overhead constant),
  * the canonicalizer's behavior on adversarial URL variants stated
  * directly, and the degree histogram's handshake identity against the
  * shared pairs frame.
  */
class CrawlCleanSpec extends SparkSpec {
  import spark.implicits._

  test("closed-form premise: corpus text holds no tag characters, and " +
    "the wrapper template's markup overhead equals the stated constant") {
    val dirty = Tables.documents(spark, sf0001)
      .filter(col("text").contains("<") || col("text").contains(">"))
      .count()
    assert(dirty == 0, "document text contains angle brackets — the " +
      "html-strip closed-form oracle premise is broken")
    val tpl = "<html><body><h1>T</h1><p>" + "X" +
      "</p><div class=\"x\">ad</div></body></html>"
    val stripped = tpl.replaceAll("<[^>]+>", "")
    assert(tpl.length - stripped.length == Extensions6.MarkupChars)
    assert(stripped == "TXad")
    assert(stripped.length - 1 == Extensions6.WrapperTextChars)
  }

  test("html strip leaves no tag characters in any stripped doc") {
    val out = Tables.documents(spark, sf0001)
      .withColumn("raw",
        when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit("<html><body><h1>T</h1><p>"), col("text"),
            lit("</p><div class=\"x\">ad</div></body></html>")))
          .otherwise(col("text")))
      .withColumn("stripped", graft.text.Web.stripTags(col("raw")))
      .filter(col("stripped").contains("<") || col("stripped").contains(">"))
      .count()
    assert(out == 0)
  }

  test("URL canonicalizer collapses host case, www prefix, tracking " +
    "query, and fragment — and keeps distinct pages apart") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM/p/7?utm_source=feed#top",
      "https://example.com/p/7?sess=3",
      "https://www.EXAMPLE.com/p/7",
      "https://example.com/p/8?sess=3")
    val canon = urls.toDF("url")
      .select(graft.text.Web.canonicalUrl(col("url")).as("c"))
      .as[String].collect().toSeq
    assert(canon.take(3).toSet == Set("https://example.com/p/7"))
    assert(canon(3) == "https://example.com/p/8")
  }

  test("degree histogram satisfies the handshake identity against the " +
    "shared pairs frame") {
    val nPairs = Extensions.defs("q_dedup_minhash")(spark, sf0001).count()
    val endpointSum = Extensions6.defs("q_graph_degree")(spark, sf0001)
      .select(sum(col("degree") * col("n_docs")))
      .as[Long].collect().head
    assert(endpointSum == 2 * nPairs)
  }

  test("levenshtein distance is zero exactly on equal names within a " +
    "block (spot-checked against the exact-dupe count)") {
    val p = Tables.part(spark, sf0001)
      .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_name"))
    val a = p.select(col("p_brand"), col("p_size"),
      col("p_partkey").as("key_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_brand"), col("p_size"),
      col("p_partkey").as("key_b"), col("p_name").as("name_b"))
    val joined = a.join(b, Seq("p_brand", "p_size"))
      .filter(col("key_a") < col("key_b"))
    val zeroDist = joined
      .filter(levenshtein(col("name_a"), col("name_b")) === 0).count()
    val equalNames = joined.filter(col("name_a") === col("name_b")).count()
    assert(zeroDist == equalNames)
  }
}
