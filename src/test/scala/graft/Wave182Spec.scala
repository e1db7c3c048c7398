package graft

import graft.queries.Breadth173
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-seventy-fourth wave (Breadth173 CvM and
  * Mood's median test). */
class Wave182Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, Long)]) =
    rows.map { case (id, lang, nc) =>
      (id, s"doc $id", lang, "web", nc)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("identical samples: CvM T sits at its theoretical minimum " +
    "-1/(6N) + small, Mood cells are balanced") {
    // perfectly interleaved equal samples
    val rows = (0 until 20).map { i =>
      (i.toLong, if (i % 2 == 0) "en" else "fr", (100 + i).toLong)
    }
    val r = Breadth173.cvm(docs(rows)).collect()(0)
    assert(r.getAs[Long]("n_en") == 10L)
    assert(r.getAs[Long]("m_other") == 10L)
    // interleaved: |F_en - F_fr| <= 1/10 everywhere -> tiny T
    assert(r.getAs[Double]("cvm_t") < 0.05)
    val m = Breadth173.moodMedian(docs(rows)).collect()(0)
    assert(m.getAs[Long]("a") == 5L)
    assert(m.getAs[Long]("b") == 5L)
    assert(math.abs(m.getAs[Double]("chi2")) < 0.5)
  }

  test("fully separated samples: CvM near its maximum, Mood chi2 " +
    "near N") {
    val rows = (0 until 20).map { i =>
      (i.toLong, if (i < 10) "en" else "fr", (100 + i).toLong)
    }
    val r = Breadth173.cvm(docs(rows)).collect()(0)
    // separated equal halves: T approaches n*m/(n+m)^2 * N... large
    assert(r.getAs[Double]("cvm_t") > 1.0)
    val m = Breadth173.moodMedian(docs(rows)).collect()(0)
    // all en below the median, all fr above
    assert(m.getAs[Long]("a") == 0L)
    assert(m.getAs[Long]("d") == 0L)
    assert(m.getAs[Double]("chi2") == 20.0)
  }

  test("CvM matches a driver-side ECDF integral recompute") {
    val d = Tables.documents(spark, sf0001)
    val r = Breadth173.cvm(d).collect()(0)
    val rows = d.select(col("doc_id"), col("n_chars"), col("lang"))
      .collect()
      .sortBy(x => (x.getAs[Long]("n_chars"), x.getAs[Long]("doc_id")))
    val n = rows.count(_.getAs[String]("lang") == "en").toLong
    val m = rows.length - n
    var i = 0L; var j = 0L; var u = 0L
    rows.zipWithIndex.foreach { case (row, idx) =>
      val rank = idx + 1L
      if (row.getAs[String]("lang") == "en") {
        i += 1; u += n * (rank - i) * (rank - i)
      } else {
        j += 1; u += m * (rank - j) * (rank - j)
      }
    }
    assert(r.getAs[Long]("u_stat") == u)
    val t = u.toDouble / (n * m * (n + m)).toDouble -
      (4.0 * n * m - 1).toDouble / (6.0 * (n + m)).toDouble
    assert(math.abs(r.getAs[Double]("cvm_t") - t) < 1e-12)
    assert(r.getAs[Double]("cvm_t") > -1.0)
  }

  test("Mood cells cover the corpus and chi2 is nonnegative") {
    val d = Tables.documents(spark, sf0001)
    val m = Breadth173.moodMedian(d).collect()(0)
    val tot = m.getAs[Long]("a") + m.getAs[Long]("b") +
      m.getAs[Long]("c") + m.getAs[Long]("d")
    assert(tot == d.count())
    assert(m.getAs[Double]("chi2") >= 0.0)
  }
}
