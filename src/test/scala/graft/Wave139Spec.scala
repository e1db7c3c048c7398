package graft

import graft.queries.Breadth131
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-thirty-second wave (Breadth131
  * leave-one-out kNN label evaluation). */
class Wave139Spec extends SparkSpec {
  import spark.implicits._

  private def vec(head: Double, tail: Double): Seq[Float] =
    (Seq.fill(32)(head.toFloat) ++ Seq.fill(32)(tail.toFloat))

  test("knnEval: tight clusters score accuracy 1.0, a planted " +
    "mislabel votes with its geometric cluster and scores 0") {
    // cluster 0 ≈ (1, 0…), cluster 1 ≈ (0, 1…) with tiny per-vector
    // jitter via one differing component magnitude; vec 5 carries
    // label 1 but sits in cluster 0 → its 5 nearest are label 0
    val emb = ((0L to 4L).map(i => (i, vec(1.0 + 0.01 * i, 0.0), 0)) ++
      (10L to 14L).map(i => (i, vec(0.0, 1.0 + 0.01 * i), 1)) :+
      ((5L, vec(1.06, 0.0), 1)))
      .toDF("vec_id", "embedding", "label")
    val got = Breadth131.knnEval(emb).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    // eval set = vec_id < 50 → all 11 vectors
    val (n0, c0, a0) = got(0)
    assert(n0 === 5L && c0 === 5L && a0 === 1.0)
    val (n1, c1, a1) = got(1)
    // the five true cluster-1 vectors vote label 1; the planted vec 5
    // votes with cluster 0 and misses
    assert(n1 === 6L && c1 === 5L)
    assert(math.abs(a1 - 5.0 / 6.0) < 1e-15)
  }
}
