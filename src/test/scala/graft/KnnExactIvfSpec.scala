package graft

import graft.queries.Breadth43
import graft.sim.Ivf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parity pins for the metric-pruned IVF kNN build (Ivf.exactKnnDirected)
  * against the all-pairs oracle twin (Breadth43.knnDirectedExact): the
  * IVF path claims recall 1.0 BY CONSTRUCTION (triangle-inequality cell
  * pruning), so the pin is set EQUALITY of the directed edge sets, not a
  * recall ratio — at every gate SF and on adversarial synthetics (hot
  * block, exact duplicates, rounded-cosine ties, blocks smaller than k). */
class KnnExactIvfSpec extends SparkSpec {
  import spark.implicits._

  private val sf001 = "/root/testdata/sf0.01"
  private val sf01 = "/root/testdata/sf0.1"

  private def edgeSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def assertParity(emb: DataFrame, k: Int = Breadth43.KnnK): Unit = {
    val exact = edgeSet(Breadth43.knnDirectedExact(emb, k))
    val ivf = edgeSet(Breadth43.knnDirected(emb, k))
    val missed = exact -- ivf
    val extra = ivf -- exact
    assert(missed.isEmpty && extra.isEmpty,
      s"IVF kNN drifted from the exact build: missed=${missed.take(5)} " +
        s"(${missed.size}) extra=${extra.take(5)} (${extra.size})")
  }

  test("IVF kNN == exact all-pairs on the sf0.001 embeddings (recall 1.0)") {
    assertParity(Tables.embeddings(spark, sf0001))
  }

  test("IVF kNN == exact all-pairs on the sf0.01 embeddings (recall 1.0)") {
    assertParity(Tables.embeddings(spark, sf001))
  }

  test("IVF kNN == exact all-pairs on the sf0.1 embeddings (recall 1.0)") {
    assertParity(Tables.embeddings(spark, sf01))
  }

  /** Deterministic pseudo-vector: dim-8, values from a sin grid — enough
    * spread for distinct cosines, no RNG state. */
  private def vec(seed: Long): Array[Float] =
    Array.tabulate(8)(d => (math.sin(seed * 31.7 + d * 2.3) +
      0.1 * math.cos(seed * 7.1 - d)).toFloat)

  test("one hot block (the scale-killer shape): 300 vectors in a single " +
    "label, plus two small labels — edge sets identical") {
    val rows = (0L until 300L).map(i => (i, vec(i), 0)) ++
      (300L until 310L).map(i => (i, vec(i), 1)) ++
      (310L until 313L).map(i => (i, vec(i), 2))
    assertParity(rows.toDF("vec_id", "embedding", "label"))
  }

  test("exact duplicates and rounded-cosine ties: clones must rank by " +
    "dst id identically in both builds") {
    // 5 distinct directions, each cloned 4× (cosine 1.0 ties everywhere),
    // one lone vector per block boundary
    val rows = for (g <- 0L until 5L; c <- 0L until 4L)
      yield (g * 10 + c, vec(g), (g % 2).toInt)
    assertParity(rows.toDF("vec_id", "embedding", "label"))
  }

  test("blocks smaller than k collapse to complete digraphs (pass-1 " +
    "shortfall: the sentinel keeps every far cell searchable)") {
    val rows = (0L until 3L).map(i => (i, vec(i), 0)) ++
      (10L until 12L).map(i => (i, vec(i + 7), 1)) ++
      Seq((20L, vec(99L), 2)) // singleton block: no edges at all
    val emb = rows.toDF("vec_id", "embedding", "label")
    assertParity(emb)
    val got = edgeSet(Breadth43.knnDirected(emb, k = 4))
    assert(got == Set((0L, 1L), (0L, 2L), (1L, 0L), (1L, 2L), (2L, 0L),
      (2L, 1L), (10L, 11L), (11L, 10L)))
  }

  test("adaptiveCells: √(n/blocks), clamped to [1, 4096]") {
    assert(Ivf.adaptiveCells(0L, 0L) == 1)
    assert(Ivf.adaptiveCells(1L, 1L) == 1)
    assert(Ivf.adaptiveCells(2000L, 10L) == 15)
    assert(Ivf.adaptiveCells(200000L, 10L) == 142)
    assert(Ivf.adaptiveCells(Long.MaxValue / 4, 1L) == 4096)
  }

  test("a forced-tiny cell grid (kCells=1: everything lands in pass 1) " +
    "and a forced-fine grid (kCells=64 over 40 rows) both stay exact") {
    val rows = (0L until 40L).map(i => (i, vec(i), (i % 3).toInt))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val exact = edgeSet(Breadth43.knnDirectedExact(emb, 4))
    assert(edgeSet(Ivf.exactKnnDirected(emb, 4, kCells = 1)) == exact)
    assert(edgeSet(Ivf.exactKnnDirected(emb, 4, kCells = 64)) == exact)
    assert(edgeSet(Ivf.exactKnnDirected(emb, 4, kCells = 7, nProbe = 1)) == exact)
  }
}
