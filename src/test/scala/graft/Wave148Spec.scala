package graft

import graft.queries.Breadth140
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-forty-first wave (Breadth140 polynomial-
  * kernel MMD drift via the explicit feature map). */
class Wave148Spec extends SparkSpec {
  import spark.implicits._

  private def pad(v: Seq[Float]): Array[Float] =
    (v ++ Seq.fill(64 - v.length)(0.0f)).toArray

  test("identical group distributions give MMD^2 = 0") {
    val v1 = pad(Seq(0.3f, -0.2f))
    val v2 = pad(Seq(-0.1f, 0.4f, 0.2f))
    val emb = Seq((1L, v1, 0), (2L, v2, 0), (3L, v1, 1), (4L, v2, 1))
      .toDF("vec_id", "embedding", "label")
    val got = Breadth140.mmdDrift(emb).collect()
    assert(got.length == 2)
    got.foreach(r => assert(r.getAs[Double]("mmd2") == 0.0))
  }

  test("hand-computed MMD^2 for orthogonal singleton groups") {
    // A = {0.1*e1}, B = {0.1*e2}: feature means differ by 0.01 at
    // (1,1) and (2,2) only -> MMD^2 = 2 * 1e-4 for both labels
    val emb = Seq(
      (1L, pad(Seq(0.1f)), 0),
      (2L, pad(Seq(0.0f, 0.1f)), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Breadth140.mmdDrift(emb).collect()
      .map(r => r.getAs[Long]("label") -> r.getAs[Double]("mmd2")).toMap
    assert(got(0L) == 2.0e-4 && got(1L) == 2.0e-4)
    val top = Breadth140.mmdTopFeature(emb).collect()
    top.foreach { r =>
      // (1,1) and (2,2) tie at 1e8 quantized units; pos 1 wins the tie
      assert(r.getAs[Long]("pos") == 1L)
      assert(r.getAs[Long]("i") == 1L && r.getAs[Long]("j") == 1L)
      assert(r.getAs[Double]("share") == 0.5)
    }
  }

  test("MMD on sf0.001: 10 labels, nonnegative, counts partition the " +
    "corpus, shares in (0, 1]") {
    val emb = Tables.embeddings(spark, sf0001)
    val got = Breadth140.mmdDrift(emb).collect()
    assert(got.length == 10)
    got.foreach { r =>
      assert(r.getAs[Double]("mmd2") >= 0.0)
      assert(r.getAs[Long]("n_in") + r.getAs[Long]("n_out") == 500L)
    }
    val top = Breadth140.mmdTopFeature(emb).collect()
    assert(top.length == 10)
    top.foreach { r =>
      val s = r.getAs[Double]("share")
      assert(s > 0.0 && s <= 1.0)
      val i = r.getAs[Long]("i"); val j = r.getAs[Long]("j")
      assert(r.getAs[Long]("pos") == (i - 1) * 16 + j)
    }
  }
}
