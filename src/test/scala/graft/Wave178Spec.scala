package graft

import graft.queries.Breadth169
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-seventieth wave (Breadth169 closeness and
  * the reach curve over the mutual-kNN graph). */
class Wave178Spec extends SparkSpec {
  import spark.implicits._

  private def edges(es: Seq[(Long, Long)]) =
    es.toDF("id_a", "id_b")

  test("hand path graph: distances, closeness, harmonic by hand") {
    // path 1-2-3-4: seeds are all 4 nodes (NSeeds=8 > |V|).
    val e = edges(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    val got = Breadth169.closeness(e).collect()
      .map(r => r.getAs[Long]("seed") ->
        (r.getAs[Long]("reached"), r.getAs[Long]("sum_dist"),
          r.getAs[Long]("eccentricity"), r.getAs[Double]("harmonic")))
      .toMap
    // seed 1: d(2)=1, d(3)=2, d(4)=3 -> sum 6, ecc 3,
    // harmonic = 1 + .5 + 1/3 (quantized: 1e9 + 5e8 + 333333333)/1e9
    assert(got(1L) == (3L, 6L, 3L, 1.833333333))
    // seed 2: d=1,1,2 -> sum 4, ecc 2, harmonic 2.5
    assert(got(2L) == (3L, 4L, 2L, 2.5))
    assert(got(3L) == (3L, 4L, 2L, 2.5))
    assert(got(4L) == (3L, 6L, 3L, 1.833333333))
    val curve = Breadth169.reachCurve(e).collect()
      .map(r => r.getAs[Long]("hop") -> r.getAs[Long]("n_pairs")).toMap
    assert(curve(0L) == 4L)
    assert(curve(1L) == 6L) // ends contribute 1 neighbor, middles 2
    assert(curve(2L) == 4L)
    assert(curve(3L) == 2L)
  }

  test("disconnected components never leak across; the horizon caps " +
    "the walk") {
    // two components: path 1-2, and a long path 10-11-...-20 (10 hops)
    val longPath = (10L until 20L).map(i => (i, i + 1))
    val e = edges(Seq((1L, 2L)) ++ longPath)
    val got = Breadth169.closeness(e).collect()
    val seeds = got.map(_.getAs[Long]("seed")).toSet
    // seeds = 8 smallest nodes: 1,2,10,11,...,15
    assert(seeds == Set(1L, 2L, 10L, 11L, 12L, 13L, 14L, 15L))
    val m = got.map(r => r.getAs[Long]("seed") -> r).toMap
    // seed 1 reaches only node 2
    assert(m(1L).getAs[Long]("reached") == 1L)
    assert(m(1L).getAs[Long]("eccentricity") == 1L)
    // seed 10 reaches 8 nodes within H=8 (11..18), not all 10
    assert(m(10L).getAs[Long]("reached") == 8L)
    assert(m(10L).getAs[Long]("eccentricity") == 8L)
  }

  test("real corpus: per-seed stats are coherent with the curve") {
    val e = queries.Breadth141.globalMutualEdges(
      Tables.embeddings(spark, sf0001))
    val got = Breadth169.closeness(e).collect()
    assert(got.nonEmpty && got.length <= 8)
    got.foreach { r =>
      val reached = r.getAs[Long]("reached")
      val sumDist = r.getAs[Long]("sum_dist")
      val ecc = r.getAs[Long]("eccentricity")
      assert(ecc <= 8L)
      assert(sumDist >= reached) // every hop >= 1
      assert(sumDist <= reached * ecc)
      val h = r.getAs[Double]("harmonic")
      assert(h > 0.0 && h <= reached.toDouble)
    }
    val curve = Breadth169.reachCurve(e).collect()
    val pairs = curve.filter(_.getAs[Long]("hop") > 0)
      .map(_.getAs[Long]("n_pairs")).sum
    assert(pairs == got.map(_.getAs[Long]("reached")).sum)
  }
}
