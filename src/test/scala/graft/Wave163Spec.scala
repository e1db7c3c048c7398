package graft

import graft.queries.Breadth154
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-fifty-fifth wave (Breadth154 from-scratch
  * HyperLogLog). */
class Wave163Spec extends SparkSpec {
  import spark.implicits._

  /** JVM twin of the register computation for one token. */
  private def regOf(tok: String): (Long, Long) = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString
    val bucket = (BigInt(hex.substring(0, 15), 16) % 64).toLong
    val v = BigInt(hex.substring(16, 31), 16).toLong
    // 60-bit leftmost-1 position: v >= 2^59 -> 1, ..., v = 1 -> 60
    val rho =
      if (v == 0) 61L
      else java.lang.Long.numberOfLeadingZeros(v).toLong - 3L
    (bucket, rho)
  }

  test("registers match the JVM leftmost-1-bit twin") {
    val toks = Seq("alpha", "beta", "gamma", "delta", "omega")
    val d = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val got = Breadth154.hllRegisters(d).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("register"))
      .toMap
    val want = toks.map(regOf).groupBy(_._1)
      .map { case (b, rs) => b -> rs.map(_._2).max }
    assert(got == want)
  }

  test("a single distinct token fills one register and estimates O(1)") {
    val d = Seq((1L, "x x x x x")).toDF("doc_id", "text")
    val got = Breadth154.hllEstimate(d).collect().head
    assert(got.getAs[Long]("n_tokens") == 5L)
    assert(got.getAs[Long]("exact_distinct") == 1L)
    assert(got.getAs[Long]("n_filled") == 1L)
    val est = got.getAs[Double]("raw_est")
    assert(est > 0.0 && est < 64.0 * 3,
      s"single-register estimate stays near small-range: $est")
  }

  test("estimate is multiplicity-invariant (a set property)") {
    val once = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val thrice = Seq((1L, "a b c d e f g h"),
      (2L, "h g f e d c b a"), (3L, "a a b b c c d d e f g h"))
      .toDF("doc_id", "text")
    val e1 = Breadth154.hllEstimate(once).collect().head
    val e3 = Breadth154.hllEstimate(thrice).collect().head
    assert(e1.getAs[Double]("raw_est") == e3.getAs[Double]("raw_est"))
    assert(e1.getAs[Long]("exact_distinct") ==
      e3.getAs[Long]("exact_distinct"))
  }

  test("sf0.001: the 31-token vocabulary estimates within the m=64 " +
    "small-range regime and registers are mergeable maxima") {
    val d = Tables.documents(spark, sf0001)
    val got = Breadth154.hllEstimate(d).collect().head
    assert(got.getAs[Long]("exact_distinct") == 31L)
    val ratio = got.getAs[Double]("ratio")
    // raw HLL (no linear-counting correction) biases HIGH at n << m;
    // the deterministic value just has to be sane and replayable
    assert(ratio > 0.5 && ratio < 3.0, s"ratio: $ratio")
    val regs = Breadth154.hllRegisters(d).collect()
    assert(regs.length == got.getAs[Long]("n_filled").toInt)
    regs.foreach(r => assert(r.getAs[Long]("register") >= 1L))
  }
}
