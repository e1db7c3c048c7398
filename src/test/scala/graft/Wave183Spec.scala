package graft

import graft.queries.Breadth174
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-seventy-fifth wave (Breadth174 rich club
  * and local clustering). */
class Wave183Spec extends SparkSpec {
  import spark.implicits._

  private def edges(es: Seq[(Long, Long)]) = es.toDF("id_a", "id_b")

  test("hand graph: triangle + pendant — counts and buckets by hand") {
    // triangle 1-2-3 plus pendant edge 3-4
    val e = edges(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    val tri = Breadth174.nodeTriangles(e).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("tri")).toMap
    assert(tri == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val hist = Breadth174.localClustering(e).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_nodes"),
          Option(r.get(r.fieldIndex("mean_c"))))).toMap
    // node 4: deg 1 -> bucket -1; nodes 1,2: C = 1 -> bucket 4;
    // node 3: deg 3, T=1 -> C = 1/3 -> bucket floor(10/6)=1
    assert(hist(-1L)._1 == 1L)
    assert(hist(4L)._1 == 2L)
    assert(hist(1L)._1 == 1L)
    assert(hist(4L)._2.get == 1.0)
    // rich club: k=1 -> nodes {1,2,3} (deg>1), edges among = 3 -> phi=1
    val rc = Breadth174.richClub(e).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
          Option(r.get(r.fieldIndex("phi"))))).toMap
    assert(rc(1L) == (3L, 3L, Some(1.0)))
    // k=2: only node 3 has deg>2 -> null phi
    assert(rc(2L)._1 == 1L)
    assert(rc(2L)._3.isEmpty)
  }

  test("real graph: phi bounded to [0,1], buckets partition the nodes") {
    val e = queries.Breadth141.globalMutualEdges(
      Tables.embeddings(spark, sf0001))
    val rc = Breadth174.richClub(e).collect()
    assert(rc.length == 4)
    rc.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("phi"))) {
        val phi = r.getAs[Double]("phi")
        assert(phi >= 0.0 && phi <= 1.0)
      }
    }
    // N_k shrinks as k grows
    val ns = rc.sortBy(_.getAs[Long]("k")).map(_.getAs[Long]("n_nodes"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })

    val hist = Breadth174.localClustering(e).collect()
    val totalNodes = hist.map(_.getAs[Long]("n_nodes")).sum
    val nNodes = Breadth174.degrees(e).count()
    assert(totalNodes == nNodes)
    hist.foreach { r =>
      if (r.getAs[Long]("bucket") >= 0 &&
        !r.isNullAt(r.fieldIndex("mean_c"))) {
        val c = r.getAs[Double]("mean_c")
        assert(c >= 0.0 && c <= 1.0)
      }
    }
  }

  test("triangle corners are consistent with the global triangle sum") {
    val e = queries.Breadth141.globalMutualEdges(
      Tables.embeddings(spark, sf0001))
    val perNode = Breadth174.nodeTriangles(e).collect()
      .map(_.getAs[Long]("tri")).sum
    // each triangle contributes 3 corner increments
    assert(perNode % 3 == 0)
  }
}
