package graft

import graft.queries.Breadth84
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the eighty-fifth wave (Breadth84 Markov
  * stationary / bipartite projection / degree histogram). */
class Wave87Spec extends SparkSpec {
  import spark.implicits._

  private def events(rows: Seq[(Long, Long, String, String)]) =
    rows.toDF("user_id", "event_id", "at", "event_type")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("markovStationary: the period-2 A<->B chain keeps the exact " +
    "uniform fixed point") {
    // one user alternating A,B,A,B,... -> transitions A->B and B->A only
    val e = events((0 until 8).map(i =>
      (1L, i.toLong, f"2024-01-01 10:${i}%02d:00",
        if (i % 2 == 0) "A" else "B")))
    val got = Breadth84.markovStationary(e, "user_id", "event_type",
        "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got === Seq(("A", Breadth84.MkScale, 0.5),
      ("B", Breadth84.MkScale, 0.5)))
  }

  test("markovStationary: an absorbing state takes all the mass") {
    // A->B once, then B->B forever
    val e = events(Seq(
      (1L, 0L, "2024-01-01 10:00:00", "A"),
      (1L, 1L, "2024-01-01 10:01:00", "B"),
      (1L, 2L, "2024-01-01 10:02:00", "B"),
      (1L, 3L, "2024-01-01 10:03:00", "B")))
    val got = Breadth84.markovStationary(e, "user_id", "event_type",
        "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got === Seq(("A", 0L, 0.0),
      ("B", 2L * Breadth84.MkScale, 1.0)))
  }

  test("markovStationary: dangling-state mass redistributes exactly as " +
    "the reference integer recurrence") {
    // only A->B; B is dangling. 2-state closed form of the fold:
    // a' = b div 2, b' = a + b div 2
    val e = events(Seq(
      (1L, 0L, "2024-01-01 10:00:00", "A"),
      (1L, 1L, "2024-01-01 10:01:00", "B")))
    var a = Breadth84.MkScale; var b = Breadth84.MkScale
    for (_ <- 1 to Breadth84.MkIters) {
      val d = b / 2; val na = d; val nb = a + d; a = na; b = nb
    }
    val got = Breadth84.markovStationary(e, "user_id", "event_type",
        "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("A", a), ("B", b)))
  }

  private val bpLineitem = Seq(
    (1L, 101L), (2L, 101L), (3L, 101L), // p101: {1,2,3}
    (1L, 102L), (2L, 102L),             // p102: {1,2}
    (2L, 103L), (3L, 103L),             // p103: {2,3}
    (1L, 104L),                         // p104: {1}
    (1L, 101L))                         // dup row: must not double-count
    .toDF("l_suppkey", "l_partkey")

  test("bipartiteProj: shared-part pairs come wedge-generated with " +
    "exact Jaccard, ordered by (shared, jaccard)") {
    val got = Breadth84.bipartiteProj(bpLineitem, minShared = 2, topN = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // degs: s1=3 s2=3 s3=2; (2,3): 2/(3+2-2)=2/3 sorts before (1,2): 0.5
    assert(got === Seq((2L, 3L, 2L, 2.0 / 3.0), (1L, 2L, 2L, 0.5)))
  }

  test("bipartiteProj: a hub part above maxPartDeg nominates NO pairs " +
    "(the hot-key cap), while supplier degrees keep counting it in the " +
    "Jaccard denominator") {
    // p200 is a hub: suppliers {1,2,3,4} — with maxPartDeg = 3 it is
    // excluded from pair generation, so (1,2)'s shared count stays 2
    // (p101, p102) and s4 pairs with nobody; but deg(s1) RISES to 4
    // because the hub still counts toward each supplier's part set.
    val hub = bpLineitem.unionAll(Seq(
      (1L, 200L), (2L, 200L), (3L, 200L), (4L, 200L))
      .toDF("l_suppkey", "l_partkey"))
    val got = Breadth84.bipartiteProj(hub, minShared = 2, topN = 20,
        maxPartDeg = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // degs with hub: s1=4 s2=4 s3=3; (2,3): 2/(4+3-2)=0.4, (1,2): 2/6
    assert(got === Seq((2L, 3L, 2L, 0.4), (1L, 2L, 2L, 2.0 / 6.0)))
    // uncapped control: the hub adds 1 to every pair's shared count and
    // promotes (1,3) and the s4 pairs into the >=2 output
    val un = Breadth84.bipartiteProj(hub, minShared = 2, topN = 20,
        maxPartDeg = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(un.map(t => (t._1, t._2)).contains((1L, 3L)))
    assert(un.find(t => (t._1, t._2) == (1L, 2L)).get._3 == 3L)
  }

  test("degreeHist: both sides of the bipartite graph histogram their " +
    "distinct-edge degrees") {
    val got = Breadth84.degreeHist(bpLineitem)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got === Seq(("part", 1L, 1L), ("part", 2L, 2L), ("part", 3L, 1L),
      ("supplier", 2L, 1L), ("supplier", 3L, 2L)))
  }
}
