package graft

import graft.queries.{Breadth146, Breadth150}
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-fifty-first wave (Breadth150 AMS
  * join-size estimation). */
class Wave159Spec extends SparkSpec {
  import spark.implicits._

  test("exact join size is the count-product sum; sketch rows are the " +
    "sign-sum products of the JVM twin") {
    val o = Seq(1L, 1L, 2L, 7L).toDF("o_orderkey")
    val l = Seq(1L, 2L, 2L, 9L).toDF("l_orderkey")
    val est = Breadth150.joinSizeEst(o, l).collect().head
    // key 1: 2*1 + key 2: 1*2 = 4 (7 and 9 never pair)
    assert(est.getAs[Long]("join_size") == 4L)
    val sk = Breadth150.joinSizeSketches(o, l).collect()
    (0 until Breadth146.AmsK).foreach { j =>
      val sa = Seq(1L, 1L, 2L, 7L)
        .map(k => Breadth146.amsSignJvm(k.toString, j)).sum
      val sb = Seq(1L, 2L, 2L, 9L)
        .map(k => Breadth146.amsSignJvm(k.toString, j)).sum
      val r = sk(j)
      assert(r.getAs[Long]("s_a") == sa && r.getAs[Long]("s_b") == sb)
      assert(r.getAs[Long]("est") == sa * sb)
    }
  }

  test("disjoint key sets have exact join size 0") {
    val o = Seq(1L, 2L).toDF("o_orderkey")
    val l = Seq(3L, 4L).toDF("l_orderkey")
    assert(Breadth150.joinSizeEst(o, l).collect().head
      .getAs[Long]("join_size") == 0L)
  }

  test("sf0.001: the FK join size equals |lineitem| (orderkey is a " +
    "key of orders) and the median is one of the five estimates") {
    val est = Breadth150.joinSizeEst(
      Tables.orders(spark, sf0001), Tables.lineitem(spark, sf0001))
      .collect().head
    assert(est.getAs[Long]("join_size") == est.getAs[Long]("n_lineitem"))
    val sk = Breadth150.joinSizeSketches(
      Tables.orders(spark, sf0001), Tables.lineitem(spark, sf0001))
      .collect().map(_.getAs[Long]("est"))
    assert(sk.length == 5)
    assert(sk.contains(est.getAs[Long]("est_median")))
  }
}
