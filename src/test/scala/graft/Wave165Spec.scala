package graft

import graft.queries.Breadth156
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-fifty-seventh wave (Breadth156 kNN-Shapley
  * data valuation). */
class Wave165Spec extends SparkSpec {
  import spark.implicits._

  private def pad(v: Seq[Float]): Array[Float] =
    (v ++ Seq.fill(64 - v.length)(0.0f)).toArray

  test("hand corpus: the recursion reproduces the closed form exactly") {
    // Probe = vec 0 (label 7). Train ranking by cosine to (1,0):
    //   rank 1: vec 21 cos~0.995 label 7 (match)
    //   rank 2: vec 22 cos~0.9   label 3 (miss)
    //   rank 3: vec 23 cos~0.6   label 7 (match)
    val emb = Seq(
      (0L, pad(Seq(1.0f, 0.0f)), 7),
      (21L, pad(Seq(0.995f, 0.1f)), 7),
      (22L, pad(Seq(0.9f, 0.44f)), 3),
      (23L, pad(Seq(0.6f, 0.8f)), 7))
      .toDF("vec_id", "embedding", "label")
    val got = Breadth156.knnShapley(emb).collect()
      .map(r => r.getAs[Long]("train_id") -> r.getAs[Long]("shapley_1e12"))
      .toMap
    // N=3, K=5 (K>N so min(K,j)=j and every term is Δ/K = Δ/5).
    // s3 = 1[m3]/3 = 1/3; s2 = s3 + (0-1)/5 = 1/3 - 1/5 = 2/15;
    // s1 = s2 + (1-0)/5 = 1/3. Truncated 1e12 units:
    // base = 1e12 div 3 = 333333333333; t2 = -(1e12 div 5) = -200000000000
    // (numerator -1e12 truncates toward zero); t1 = +200000000000.
    assert(got(23L) == 333333333333L)
    assert(got(22L) == 133333333333L)
    assert(got(21L) == 333333333333L)
    // value ranking: ties by train_id asc -> 21 before 23.
    val order = Breadth156.knnShapley(emb).collect()
      .map(r => (r.getAs[Long]("value_rank"), r.getAs[Long]("train_id")))
    assert(order.toSeq == Seq((1L, 21L), (2L, 23L), (3L, 22L)))
  }

  test("efficiency: per-probe total value telescopes to the top-K " +
    "match share (within integer truncation)") {
    val emb = Tables.embeddings(spark, sf0001)
    val pairs = Breadth156.shapleyPairs(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totals = pairs.groupBy("probe_id")
        .agg(sum(col("shapley_1e12")).as("tot"),
          sum(when(col("rnk") <= Breadth156.K, col("agree"))
            .otherwise(lit(0L))).as("topk_match"),
          count(lit(1)).as("n"))
        .collect()
      assert(totals.length == 20)
      totals.foreach { r =>
        val expected =
          r.getAs[Long]("topk_match") * Breadth156.Scale / Breadth156.K
        val n = r.getAs[Long]("n")
        // Σ_i s_i = Σ_j j·c_j; each c_j truncated by < 1 unit.
        val tol = n * (n + 1) / 2
        assert(math.abs(r.getAs[Long]("tot") - expected) <= tol,
          s"probe ${r.get(0)}: ${r.getAs[Long]("tot")} vs $expected")
      }
    } finally pairs.unpersist()
  }

  test("value is monotone in distance rank per agreement class: " +
    "matches never gain from distance, misses never lose") {
    val emb = Tables.embeddings(spark, sf0001)
    val rows = Breadth156.shapleyPairs(emb)
      .select("probe_id", "agree", "rnk", "shapley_1e12")
      .collect()
      .groupBy(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("agree")))
    rows.foreach { case ((_, agree), rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rnk"))
        .map(_.getAs[Long]("shapley_1e12"))
      byRank.zip(byRank.tail).foreach { case (a, b) =>
        // exact-rational monotone; truncated units can perturb by a hair.
        // A nearer match is worth >= a farther match; a nearer miss
        // hurts >= a farther miss (so its value is <=).
        if (agree == 1L) assert(a >= b - 4L) else assert(a <= b + 4L)
      }
    }
  }

  test("label aggregate is consistent with the pair table") {
    val emb = Tables.embeddings(spark, sf0001)
    val byLabel = Breadth156.shapleyByLabel(emb).collect()
    assert(byLabel.map(_.getAs[Int]("label")).toSeq == (0 to 9))
    val total = byLabel.map(_.getAs[Long]("sum_shapley_1e12")).sum
    val pairTotal = Breadth156.shapleyPairs(emb)
      .agg(sum("shapley_1e12")).collect()(0).getLong(0)
    assert(total == pairTotal)
    byLabel.foreach { r =>
      val mean = r.getAs[Double]("mean_shapley")
      assert(mean == r.getAs[Long]("sum_shapley_1e12").toDouble /
        (r.getAs[Long]("n_pairs") * Breadth156.Scale).toDouble)
    }
  }
}
