package graft

import graft.queries.Breadth167
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-sixty-eighth wave (Breadth167 rendezvous
  * sharding). */
class Wave176Spec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hrw(docId: Long, shards: Int): Long =
    (0 until shards).map { s =>
      val w = java.lang.Long.parseLong(
        md5hex(s"rdv#$docId#$s").take(14), 16)
      (w * 16 + s, s.toLong)
    }.maxBy(_._1)._2

  test("assignments match a driver-side HRW recompute") {
    val d = Tables.documents(spark, sf0001)
    val got = Breadth167.packed(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard8"), r.getAs[Long]("shard9"))).toMap
    got.take(50).foreach { case (id, (s8, s9)) =>
      assert(s8 == hrw(id, 8), s"doc $id shard8")
      assert(s9 == hrw(id, 9), s"doc $id shard9")
    }
  }

  test("8-shard histogram is balanced and covers the corpus") {
    val d = Tables.documents(spark, sf0001)
    val h = Breadth167.rendezvous(d).collect()
    assert(h.map(_.getAs[Long]("shard")).toSeq == (0L to 7L))
    val n = h.map(_.getAs[Long]("n_docs")).sum
    assert(n == d.count())
    // md5 is uniform: every shard within 3x of fair share at 500 docs
    h.foreach { r =>
      val share = r.getAs[Double]("share")
      assert(share > 0.125 / 3 && share < 0.125 * 3)
    }
  }

  test("resize movement: HRW moves ~1/9, mod-N moves ~8/9") {
    val d = Tables.documents(spark, sf0001)
    val r = Breadth167.rendezvousResize(d).collect()(0)
    val hrwShare = r.getAs[Double]("moved_share_hrw")
    val modShare = r.getAs[Double]("moved_share_mod")
    // binomial(500, 1/9) is tight: accept [0.05, 0.18]
    assert(hrwShare > 0.05 && hrwShare < 0.18, s"hrw $hrwShare")
    assert(modShare > 0.75 && modShare < 0.97, s"mod $modShare")
    assert(hrwShare < modShare / 4)
    // only docs whose 9-shard winner is the NEW shard move
    val moved = Breadth167.packed(d)
      .filter(col("shard8") =!= col("shard9")).collect()
    moved.foreach(m => assert(m.getAs[Long]("shard9") == 8L))
    assert(moved.length.toLong == r.getAs[Long]("moved_hrw"))
  }
}
