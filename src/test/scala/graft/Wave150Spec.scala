package graft

import graft.queries.Breadth142
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-forty-third wave (Breadth142 multiclass
  * nearest-centroid probe). */
class Wave150Spec extends SparkSpec {
  import spark.implicits._

  private def pad(v: Seq[Float]): Array[Float] =
    (v ++ Seq.fill(64 - v.length)(0.0f)).toArray

  test("tight clusters probe perfectly: diagonal confusion, " +
    "accuracy 1, macro recall 1") {
    val emb = (
      (1L to 4L).map(i => (i, pad(Seq(0.5f, 0.01f * i)), 0)) ++
      (11L to 14L).map(i => (i, pad(Seq(-0.5f, 0.01f * i)), 1)) ++
      (21L to 24L).map(i => (i, pad(Seq(0.0f, 0.0f, 0.5f + 0.01f * i)), 2)))
      .toDF("vec_id", "embedding", "label")
    val conf = Breadth142.probeConfusion(emb).collect()
    assert(conf.forall(r => r.getAs[Long]("label") == r.getAs[Long]("pred")))
    assert(conf.map(_.getAs[Long]("n")).sum == 12L)
    val ev = Breadth142.probeEval(emb).collect().head
    assert(ev.getAs[Double]("accuracy") == 1.0)
    assert(ev.getAs[Double]("macro_recall") == 1.0)
  }

  test("equidistant tie predicts the smaller label") {
    // two singleton centroids at +e1 and -e1; a third vector at the
    // exact midpoint (origin) carries label 9 -> its class centroid is
    // itself... use 2-vector classes so the probe vector is NOT its
    // own centroid: classes 0 and 1 symmetric, probe at origin in
    // class 1 shifts that centroid - instead pin the tie through
    // assignments on a vector exactly between two foreign centroids.
    val emb = Seq(
      (1L, pad(Seq(0.4f)), 0), (2L, pad(Seq(0.4f)), 0),
      (11L, pad(Seq(-0.4f)), 1), (12L, pad(Seq(-0.4f)), 1),
      // orthogonal probe pair, label 2: scores vs centroids 0/1 tie
      (21L, pad(Seq(0.0f, 0.3f)), 2), (22L, pad(Seq(0.0f, -0.3f)), 2))
      .toDF("vec_id", "embedding", "label")
    val asg = Breadth142.assignments(emb).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("pred")).toMap
    // class-2 members are each nearest their own centroid? centroid of
    // class 2 = floored mean of (0,300) and (0,-300) = (0, 0): distance
    // to each member = 300 < 500 to classes 0/1 -> predicted 2.
    assert(asg(21L) == 2L && asg(22L) == 2L)
    // vectors 1,2 (q = 400): own centroid at distance 0 -> pred 0
    assert(asg(1L) == 0L && asg(11L) == 1L)
  }

  test("floored integer means use trunc-toward-zero division") {
    // class 0: q1 = -3, q2 = 0 on coord 1 -> sum -3, n 2,
    // -3 div 2 = -1 (NOT floor -2). A probe at q = -1 on coord 1 must
    // then be distance 0 from the centroid.
    val emb = Seq(
      (1L, pad(Seq(-0.003f)), 0), (2L, pad(Seq(0.0f)), 0),
      (3L, pad(Seq(0.5f)), 1), (4L, pad(Seq(0.52f)), 1),
      (5L, pad(Seq(-0.001f)), 2), (6L, pad(Seq(-0.001f)), 2))
      .toDF("vec_id", "embedding", "label")
    val asg = Breadth142.assignments(emb).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("pred"), r.getAs[Long]("score"))).toMap
    // class-2 members sit exactly ON the trunc'd class-0 centroid
    // (-1): score vs centroid 0 = 2*(-1)*(-1) - 1 = 1; score vs their
    // own centroid (-1) is the same -> tie broken toward label 0.
    assert(asg(5L)._1 == 0L,
      s"trunc-toward-zero centroid tie must break to label 0: ${asg(5L)}")
  }

  test("sf0.001: confusion partitions the corpus; self-fit probe " +
    "beats chance on random labels (overfit bias) but stays far from " +
    "perfect") {
    val emb = Tables.embeddings(spark, sf0001)
    val conf = Breadth142.probeConfusion(emb).collect()
    assert(conf.map(_.getAs[Long]("n")).sum == 500L)
    val ev = Breadth142.probeEval(emb).collect().head
    val acc = ev.getAs[Double]("accuracy")
    assert(acc > 0.15, s"self-fit above 10-class chance: $acc")
    assert(acc < 0.9, s"random labels cannot probe cleanly: $acc")
    assert(ev.getAs[Long]("n_classes") == 10L)
  }
}
