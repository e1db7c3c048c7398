package graft

import graft.queries.Breadth158
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-fifty-ninth wave (Breadth158 WOE/IV and
  * target encoding). */
class Wave167Spec extends SparkSpec {
  import spark.implicits._

  private def li(rows: Seq[(Double, String, Long)]) =
    rows.zipWithIndex.map { case ((qty, rf, supp), i) =>
      (i.toLong, 1L, supp, 1, qty, 100.0, 0.0, 0.0, rf, "O",
        java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")

  test("hand bins: WOE and IV match the textbook formula") {
    // bucket 0 (qty 1-10): 3 bad, 1 good; bucket 4 (qty 41-50):
    // 1 bad, 3 good. tb=4, tg=4.
    val rows = Seq(
      (5.0, "R", 1L), (6.0, "R", 1L), (7.0, "R", 1L), (8.0, "N", 1L),
      (45.0, "R", 2L), (46.0, "N", 2L), (47.0, "N", 2L), (48.0, "N", 2L))
    val got = Breadth158.woeIv(li(rows)).collect()
    assert(got.map(_.getAs[Long]("bucket_id")).toSeq == Seq(0L, 4L))
    val woe0 = got(0).getAs[Double]("woe")
    val woe4 = got(1).getAs[Double]("woe")
    // woe0 = ln((3/4)/(1/4)) = ln(3); woe4 = ln((1/4)/(3/4)) = -ln(3)
    assert(woe0 == math.rint(math.log(3.0) * 1e6) / 1e6 ||
      woe0 == BigDecimal(math.log(3.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(woe4 == -woe0 || math.abs(woe4 + woe0) < 2e-6)
    // IV = (3/4-1/4)*woe0 + (1/4-3/4)*woe4 = woe0 (both terms equal)
    val iv = got(0).getAs[Double]("iv")
    assert(math.abs(iv - woe0) < 2e-9)
    assert(got.map(_.getAs[Double]("iv")).distinct.length == 1)
  }

  test("degenerate bin (zero goods) yields null WOE and a zero IV term") {
    val rows = Seq(
      (5.0, "R", 1L), (6.0, "R", 1L), // bucket 0: all bad
      (45.0, "R", 2L), (46.0, "N", 2L), (47.0, "N", 2L))
    val got = Breadth158.woeIv(li(rows)).collect()
    val b0 = got.find(_.getAs[Long]("bucket_id") == 0L).get
    assert(b0.isNullAt(b0.fieldIndex("woe")))
    val b4 = got.find(_.getAs[Long]("bucket_id") == 4L).get
    assert(!b4.isNullAt(b4.fieldIndex("woe")))
  }

  test("target encoding shrinks toward the prior as evidence thins") {
    val docs = Tables.lineitem(spark, sf0001)
    val got = Breadth158.targetEncode(docs).collect()
    val nSupp = docs.select("l_suppkey").distinct.count()
    assert(got.length == math.min(Breadth158.TopSupp.toLong, nSupp))
    val prior = got.head.getAs[Double]("prior")
    got.foreach { r =>
      val enc = r.getAs[Double]("enc")
      val raw = r.getAs[Long]("n_bad").toDouble / r.getAs[Long]("n_rows")
      assert(enc >= 0.0 && enc <= 1.0)
      // enc lies strictly between the raw rate and the prior
      assert((enc - raw) * (prior - raw) >= 0.0)
      assert(math.abs(enc - prior) <= math.abs(raw - prior) + 1e-12)
    }
    // ordering: volume desc, suppkey asc
    val ns = got.map(_.getAs[Long]("n_rows")).toSeq
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("IV at sf0.001 is finite and bins cover all rows") {
    val docs = Tables.lineitem(spark, sf0001)
    val got = Breadth158.woeIv(docs).collect()
    assert(got.nonEmpty)
    val total = got.map(_.getAs[Long]("n_rows")).sum
    assert(total == docs.count())
    got.foreach(r => assert(!r.getAs[Double]("iv").isNaN))
  }
}
