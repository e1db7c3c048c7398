package graft

import graft.queries.Breadth172
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-seventy-third wave (Breadth172 Hill
  * diversity numbers). */
class Wave181Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String)]) =
    rows.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("uniform source: all three Hill numbers equal the type count") {
    // 4 types, each exactly twice -> 0D = 1D = 2D = 4
    val d = docs(Seq((1L, "u", "a b c d a b c d")))
    val r = Breadth172.hillNumbers(d).collect()(0)
    assert(r.getAs[Long]("hill0") == 4L)
    assert(math.abs(r.getAs[Double]("hill1") - 4.0) < 0.01)
    assert(r.getAs[Double]("hill2") == 4.0)
  }

  test("skew orders the spectrum: 0D >= 1D >= 2D, boilerplate " +
    "collapses toward 1") {
    val d = docs(Seq(
      (1L, "skewed", "x x x x x x x x x y z"),
      (2L, "flat", "p q r s t u v w")))
    val m = Breadth172.hillNumbers(d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    Seq("skewed", "flat").foreach { s =>
      val r = m(s)
      val (h0, h1, h2) = (r.getAs[Long]("hill0").toDouble,
        r.getAs[Double]("hill1"), r.getAs[Double]("hill2"))
      assert(h0 >= h1 - 0.01 && h1 >= h2 - 0.01, s"$s: $h0 $h1 $h2")
    }
    // the skewed source's effective vocab is far below its richness
    assert(m("skewed").getAs[Double]("hill2") <
      m("skewed").getAs[Long]("hill0") / 2.0)
    assert(m("flat").getAs[Double]("hill2") >
      m("flat").getAs[Long]("hill0") - 0.01)
  }

  test("real corpus: spectrum ordering holds per source; effective " +
    "sources bounded by the count") {
    val d = Tables.documents(spark, sf0001)
    val rs = Breadth172.hillNumbers(d).collect()
    assert(rs.nonEmpty)
    rs.foreach { r =>
      val h0 = r.getAs[Long]("hill0").toDouble
      val h1 = r.getAs[Double]("hill1")
      val h2 = r.getAs[Double]("hill2")
      assert(h1 >= 1.0 && h2 >= 1.0)
      assert(h0 >= h1 - 0.01)
      assert(h1 >= h2 - 0.01)
    }
    val eff = Breadth172.sourceEffective(d).collect()(0)
    val ns = eff.getAs[Long]("n_sources").toDouble
    assert(eff.getAs[Double]("eff_shannon") <= ns + 0.01)
    assert(eff.getAs[Double]("eff_simpson") <=
      eff.getAs[Double]("eff_shannon") + 0.01)
    assert(eff.getAs[Double]("eff_simpson") >= 1.0)
  }
}
