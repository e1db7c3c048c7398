package graft

import graft.queries.{Extensions, Extensions7}
import org.apache.spark.sql.functions._

/** Properties of the corpus/vocabulary profiling wave that the DuckDB
  * differential can't state: conservation identities against the shared
  * frames, fixture-level bigram semantics, coverage-curve monotonicity,
  * and the degenerate-vector flags on an adversarial embedding.
  */
class CorpusProfileSpec extends SparkSpec {
  import spark.implicits._

  test("cross-source overlap matrix conserves the verified pair count") {
    val nPairs = Extensions.defs("q_dedup_minhash")(spark, sf0001).count()
    val cells = Extensions7.defs("q_cross_source_overlap")(spark, sf0001)
      .agg(sum("n_pairs")).as[Long].collect().head
    assert(cells == nPairs)
  }

  test("bigram merge counts match hand-counted adjacent pairs on a " +
    "fixture with repeats and a one-token doc") {
    val df = Seq("a b a b c", "b c", "x").toDF("text")
    val out = df
      .select(graft.text.Text.tokens(col("text")).as("toks"))
      .select(explode(expr(
        "transform(slice(toks, 1, size(toks) - 1), " +
          "(t, i) -> concat(t, ' ', toks[i + 1]))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("a b" -> 2L, "b a" -> 1L, "b c" -> 2L))
  }

  test("vocab coverage shares are monotone in k and bounded by 1") {
    val rows = Extensions7.defs("q_vocab_coverage")(spark, sf0001)
      .select("k", "share").as[(Int, Double)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array((_, a), (_, b)) => assert(a <= b)
      case _ =>
    }
    assert(rows.last._2 <= 1.0 && rows.head._2 > 0.0)
  }

  test("hapax counts conserve: per-doc occurrences sum to the number " +
    "of count-1 vocabulary tokens") {
    val vocabHapax = Tables.documents(spark, sf0001)
      .select(explode(graft.text.Text.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .filter(col("n") === 1).count()
    val perDocSum = Extensions7.defs("q_hapax")(spark, sf0001)
      .agg(sum("n_hapax")).as[Long].collect().head
    assert(perDocSum == vocabHapax)
  }

  test("minhash estimate is a multiple of 1/K and lands within the " +
    "coarse-sketch band of the exact jaccard on every verified pair") {
    val rows = Extensions.defs("q_minhash_est")(spark, sf0001)
      .select("est_j", "err").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (est, err) =>
      val scaled = est * 12.0
      assert(math.abs(scaled - math.round(scaled)) < 1e-12,
        s"est $est is not a multiple of 1/12")
      assert(math.abs(err) <= 0.5, s"err $err beyond the K=12 band")
    }
  }

  test("embedding QC conserves the corpus and flags an injected " +
    "zero vector and NaN component") {
    val n = Tables.embeddings(spark, sf0001).count()
    val out = Extensions7.defs("q_embed_qc")(spark, sf0001)
    assert(out.agg(sum("n_vecs")).as[Long].collect().head == n)
    // the synthetic corpus is clean
    assert(out.agg(sum("n_zero"), sum("n_nonfinite"))
      .as[(Long, Long)].collect().head == ((0L, 0L)))
    // adversarial rows through the same expressions
    val adv = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(Float.NaN, 1.0f)),
      (3L, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("dot", expr("aggregate(v, 0D, (acc, x) -> acc + x * x)"))
      .withColumn("norm", sqrt(col("dot")))
      .withColumn("bad",
        expr("exists(v, x -> isnan(x) OR abs(x) = cast('Infinity' AS double))"))
    val rows = adv.select("vec_id", "norm", "bad")
      .as[(Long, Double, Boolean)].collect().sortBy(_._1)
    assert(rows(0)._2 == 0.0 && !rows(0)._3)
    assert(rows(1)._2.isNaN && rows(1)._3)
    assert(rows(2)._2 == 5.0 && !rows(2)._3)
  }
}
