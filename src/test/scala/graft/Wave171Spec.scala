package graft

import graft.queries.Breadth162
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-sixty-third wave (Breadth162 quantile
  * normalization). */
class Wave171Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, Long)]) =
    rows.map { case (id, src, nc) =>
      (id, s"doc $id", "en", src, nc)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("hand corpus: equal-size sources map rank k to pooled order " +
    "statistic 2k-1") {
    // source a: lengths 10,20,30; source b: 1000,2000,3000.
    // pooled sorted: 10,20,30,1000,2000,3000 (N=6, ns=3).
    // rank r -> ((r-1)*6) div 3 + 1 = 2r-1 -> pooled ranks 1,3,5.
    val d = docs(Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 1000L), (5L, "b", 2000L), (6L, "b", 3000L)))
    val m = Breadth162.normalized(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("pool_rank"), r.getAs[Long]("norm_chars"))).toMap
    assert(m(1L) == (1L, 10L)); assert(m(2L) == (3L, 30L))
    assert(m(3L) == (5L, 2000L))
    assert(m(4L) == (1L, 10L)); assert(m(5L) == (3L, 30L))
    assert(m(6L) == (5L, 2000L))
    // post-transform the two sources have IDENTICAL length multisets
    val audit = Breadth162.quantileNorm(d).collect()
    assert(audit.map(_.getAs[Double]("mean_norm")).distinct.length == 1)
  }

  test("transform preserves within-source order and lands in the " +
    "pooled support") {
    val d = Tables.documents(spark, sf0001)
    val rows = Breadth162.normalized(d).collect()
    val support = d.select("n_chars").collect()
      .map(_.getAs[Long]("n_chars")).toSet
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("src_rank"))
      val norms = sorted.map(_.getAs[Long]("norm_chars"))
      assert(norms.zip(norms.tail).forall { case (a, b) => a <= b })
      val raws = sorted.map(_.getAs[Long]("n_chars"))
      assert(raws.zip(raws.tail).forall { case (a, b) => a <= b })
    }
    rows.foreach(r => assert(support.contains(r.getAs[Long]("norm_chars"))))
    // target rank stays in [1, N]
    val n = rows.length.toLong
    rows.foreach { r =>
      val t = r.getAs[Long]("pool_rank")
      assert(t >= 1L && t <= n)
    }
  }

  test("audit: normalized means are pulled together across sources") {
    val d = Tables.documents(spark, sf0001)
    val audit = Breadth162.quantileNorm(d).collect()
    assert(audit.length > 1)
    val rawSpread = {
      val ms = audit.map(_.getAs[Double]("mean_raw"))
      ms.max - ms.min
    }
    val normSpread = {
      val ms = audit.map(_.getAs[Double]("mean_norm"))
      ms.max - ms.min
    }
    assert(normSpread <= rawSpread + 1e-9)
    val n = audit.map(_.getAs[Long]("n")).sum
    assert(n == d.count())
  }
}
