package graft

import graft.queries.Breadth137
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-thirty-eighth wave (Breadth137 power
  * iteration). */
class Wave145Spec extends SparkSpec {
  import spark.implicits._

  private def pad(v: Seq[Float]): Array[Float] =
    (v ++ Seq.fill(64 - v.length)(0.0f)).toArray

  test("power iteration on a rank-1 matrix recovers the direction " +
    "exactly (max-normalized) in one step") {
    // rows are multiples of w = (0.8, 0.4, 0.2, 0, ...): the dominant
    // (only) right-singular direction; loadings = w / max|w|
    val w = Seq(0.8f, 0.4f, 0.2f)
    val emb = Seq(1.0f, 2.0f, 0.5f).zipWithIndex.map { case (c, i) =>
      (i.toLong, pad(w.map(_ * c)), 0)
    }.toDF("vec_id", "embedding", "label")
    val got = Breadth137.powerIteration(emb).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 1.0) < 1e-9)
    assert(math.abs(got(2L) - 0.5) < 1e-3)
    assert(math.abs(got(3L) - 0.25) < 1e-3)
    assert((4L to 64L).forall(p => got(p) == 0.0))
  }

  test("power iteration converges to the DOMINANT of two orthogonal " +
    "directions") {
    // 5 rows along e1 (strong), 2 rows along e2 (weak): the top
    // direction is e1; e2's loading shrinks toward 0 over iterations
    val emb = ((0L until 5L).map(i => (i, pad(Seq(1.0f, 0.0f)), 0)) ++
      (10L until 12L).map(i => (i, pad(Seq(0.0f, 1.0f)), 0)))
      .toDF("vec_id", "embedding", "label")
    val got = Breadth137.powerIteration(emb).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 1.0, "dominant coordinate carries the max loading")
    assert(math.abs(got(2L)) < 1e-3,
      s"weak orthogonal direction must decay: ${got(2L)}")
  }

  test("power iteration is deterministic: two runs bit-equal") {
    val emb = Tables.embeddings(spark, sf0001).limit(50)
    val a = Breadth137.powerIteration(emb, iters = 3).collect().toSeq
    val b = Breadth137.powerIteration(emb, iters = 3).collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }
}
