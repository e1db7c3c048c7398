package graft

import graft.queries.Breadth145
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-forty-sixth wave (Breadth145 split-
  * conformal prediction). */
class Wave153Spec extends SparkSpec {
  import spark.implicits._

  /** JVM twin of the md5-parity split (first 15 hex chars mod 2). */
  private def isCal(id: Long): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.substring(0, 15)
    BigInt(hex, 16) % 2 == 0
  }

  private def docs(n: Int) = (1 to n).map { i =>
    (i.toLong, "s" + (i % 3), 40L + (i * 17) % 100)
  }.toDF("doc_id", "source", "n_chars").withColumn("text", lit("x"))
    .withColumn("lang", lit("en"))

  test("conformal matches a driver-side reference implementation") {
    val d = docs(80)
    val rows = (1 to 80).map(i =>
      (i.toLong, "s" + (i % 3), 40L + (i * 17) % 100))
    val cal = rows.filter(r => isCal(r._1))
    val preds = cal.groupBy(_._2).map { case (s, rs) =>
      s -> rs.map(_._3).sum / rs.length } // integer div, all positive
    val calScores = cal.map(r => (math.abs(r._3 - preds(r._2)), r._1))
      .sortBy(identity)
    val k = (((cal.length + 1) * 9) + 9) / 10
    val qhat = calScores(k - 1)._1
    val test = rows.filter(r => !isCal(r._1))
      .filter(r => preds.contains(r._2))
    val covered = test.count(r => math.abs(r._3 - preds(r._2)) <= qhat)
    val got = Breadth145.conformal(d).collect().head
    assert(got.getAs[Long]("n_cal") == cal.length.toLong)
    assert(got.getAs[Long]("qhat") == qhat.toLong)
    assert(got.getAs[Long]("n_test") == test.length.toLong)
    assert(got.getAs[Long]("n_covered") == covered.toLong)
  }

  test("per-source coverage decomposes the global audit") {
    val d = docs(80)
    val glob = Breadth145.conformal(d).collect().head
    val bySrc = Breadth145.conformalBySource(d).collect()
    assert(bySrc.map(_.getAs[Long]("n_test")).sum ==
      glob.getAs[Long]("n_test"))
    assert(bySrc.map(_.getAs[Long]("n_covered")).sum ==
      glob.getAs[Long]("n_covered"))
  }

  test("sf0.001: coverage honours the conformal guarantee band") {
    val got = Breadth145.conformal(Tables.documents(spark, sf0001))
      .collect().head
    assert(got.getAs[Long]("n_cal") + got.getAs[Long]("n_test") == 500L)
    val cov = got.getAs[Double]("coverage")
    // guarantee is >= 0.9 in expectation; finite-sample wobble stays
    // well inside +-7pp at n_test ~ 250
    assert(cov > 0.83 && cov <= 1.0, s"coverage: $cov")
  }
}
