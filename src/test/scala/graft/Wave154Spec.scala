package graft

import graft.queries.Breadth146
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-forty-seventh wave (Breadth146 AMS F2
  * sketch). */
class Wave154Spec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  /** JVM twin of the md5 sign (hex chars 17..31 parity). */
  private def signOf(tok: String, j: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest((tok + "#" + j).getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.substring(16, 31)
    if (BigInt(hex, 16) % 2 == 0) 1L else -1L
  }

  test("a single repeated token estimates F2 exactly (ratio 1)") {
    val d = docs(Seq("x x x x", "x x x"))
    val got = Breadth146.amsF2(d).collect().head
    assert(got.getAs[Long]("n_tokens") == 7L)
    assert(got.getAs[Long]("f2_exact") == 49L)
    assert(got.getAs[Long]("est_median") == 49L)
    assert(got.getAs[Double]("ratio") == 1.0)
  }

  test("sketch sums match the driver-side md5 sign twin") {
    val toks = Seq("a", "b", "a", "c", "b", "a")
    val d = docs(Seq(toks.mkString(" ")))
    val got = Breadth146.amsSketches(d).collect()
      .map(r => r.getAs[Long]("sketch_id") -> r.getAs[Long]("s")).toMap
    (0 until Breadth146.AmsK).foreach { j =>
      val want = toks.map(signOf(_, j)).sum
      assert(got(j.toLong) == want, s"estimator $j")
    }
  }

  test("sf0.001: 5 sketches, the median estimate is one of them, and " +
    "exact F2 bounds hold (N <= F2 <= N^2)") {
    val d = Tables.documents(spark, sf0001)
    val sk = Breadth146.amsSketches(d).collect()
    assert(sk.length == 5)
    val f2 = Breadth146.amsF2(d).collect().head
    val n = f2.getAs[Long]("n_tokens")
    val exact = f2.getAs[Long]("f2_exact")
    assert(exact >= n && exact <= n * n)
    assert(sk.map(_.getAs[Long]("est")).contains(
      f2.getAs[Long]("est_median")))
    assert(f2.getAs[Double]("ratio") > 0.0)
  }
}
