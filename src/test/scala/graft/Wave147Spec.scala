package graft

import graft.queries.Breadth139
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-fortieth wave (Breadth139 Kneser–Ney
  * bigram LM + perplexity gate). */
class Wave147Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  test("KN probabilities normalize: hand-computed P(b|a), P(c|a) sum " +
    "to 1 and score the right docs") {
    // corpus: "a b" x2, "a c" -> c(a,b)=2, c(a,c)=1, c(a.)=3,
    // N1+(a.)=2, N1+(.b)=1, N1+(.c)=1, N1+(..)=2
    // P(b|a) = 1.25/3 + (0.75*2/3)*(1/2) = 2/3 ; P(c|a) = 1/3
    val d = docs(Seq((1L, "a b"), (2L, "a b"), (3L, "a c")))
    val got = Breadth139.knScores(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val lp23 = math.floor(1e6 * math.log(2.0 / 3.0) / math.log(2.0)) / 1e6
    val lp13 = math.floor(1e6 * math.log(1.0 / 3.0) / math.log(2.0)) / 1e6
    assert(math.abs(got(1L).getAs[Double]("avg_log2p") - lp23) < 2e-6)
    assert(math.abs(got(3L).getAs[Double]("avg_log2p") - lp13) < 2e-6)
    // gate: micro-mean sits between the two scores
    assert(got(1L).getAs[Boolean]("keep") && got(2L).getAs[Boolean]("keep"))
    assert(!got(3L).getAs[Boolean]("keep"))
  }

  test("continuation counts rank versatility, not frequency") {
    // 'a' follows 3 distinct contexts; 'b' follows 1 but occurs 3x
    val d = docs(Seq((1L, "x a"), (2L, "y a"), (3L, "z a"),
      (4L, "x b"), (5L, "x b"), (6L, "x b")))
    val got = Breadth139.knContinuation(d).collect()
    assert(got.map(r => (r.getAs[Long]("rank"), r.getAs[String]("tok"),
      r.getAs[Long]("cont_count"))).toSeq ==
      Seq((1L, "a", 3L), (2L, "b", 1L)))
    assert(got.head.getAs[Double]("p_cont") == 0.75)
  }

  test("single-token docs drop (no bigrams) and never gate") {
    val d = docs(Seq((1L, "lonely"), (2L, "a b")))
    val got = Breadth139.knScores(d).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("KN on sf0.001: every doc scores, probabilities are valid " +
    "(avg_log2p < 0), and the gate splits the corpus nontrivially") {
    val got = Breadth139.knScores(Tables.documents(spark, sf0001)).collect()
    assert(got.length == 500)
    assert(got.forall(_.getAs[Double]("avg_log2p") < 0.0))
    val kept = got.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < 500)
  }
}
