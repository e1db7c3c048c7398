package graft

import graft.queries.Breadth163
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-sixty-fourth wave (Breadth163 Horvitz–
  * Thompson and the delete-one-group jackknife). */
class Wave172Spec extends SparkSpec {
  import spark.implicits._

  private def li(rows: Seq[(Long, Int, Long, Double, Double, String)]) =
    rows.map { case (ok, ln, supp, qty, price, rf) =>
      (ok, 1L, supp, ln, qty, price, 0.0, 0.0, rf, "O",
        java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")

  test("HT estimator reproduces a driver-side recompute exactly") {
    val l = Tables.lineitem(spark, sf0001)
    val got = Breadth163.horvitzThompson(l).collect()(0)
    val rows = l.select(col("l_orderkey"), col("l_linenumber"),
      col("l_returnflag"), col("l_quantity").cast("long")).collect()
    def h(ok: Long, ln: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ht#$ok#$ln".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    var tHat = 0L; var tTrue = 0L; var nS = 0L
    rows.foreach { r =>
      val y = r.getLong(3)
      val isR = r.getString(2) == "R"
      val hv = h(r.getLong(0), r.getInt(1))
      val in = if (isR) hv % 2 == 0 else hv % 10 == 0
      tTrue += y
      if (in) { nS += 1; tHat += (if (isR) 2 else 10) * y }
    }
    assert(got.getAs[Long]("t_hat") == tHat)
    assert(got.getAs[Long]("t_true") == tTrue)
    assert(got.getAs[Long]("n_sampled") == nS)
    // the realized error of a design-unbiased estimator on this
    // corpus should be small (π never below 1/10)
    assert(math.abs(got.getAs[Double]("rel_err")) < 0.2)
  }

  test("hand jackknife: two balanced groups give symmetric deviations") {
    // group 1: 100 cents / 1 qty; group 2: 300 cents / 1 qty.
    // full ratio = 200; loo_1 = 300, loo_2 = 100.
    val rows = Seq(
      (1L, 1, 10L, 1.0, 1.0, "N"), // 100 cents
      (2L, 1, 20L, 1.0, 3.0, "N")) // 300 cents
    val got = Breadth163.jackknife(li(rows)).collect()
      .map(r => r.getAs[Long]("l_suppkey") ->
        (r.getAs[Double]("r_loo"), r.getAs[Double]("pseudovalue"))).toMap
    assert(got(10L)._1 == 300.0)
    assert(got(20L)._1 == 100.0)
    // pseudovalue = 2*200 - 1*loo
    assert(got(10L)._2 == 100.0)
    assert(got(20L)._2 == 300.0)
    val se = Breadth163.jackknifeSe(li(rows)).collect()(0)
    assert(se.getAs[Long]("g") == 2L)
    assert(se.getAs[Double]("r_hat") == 200.0)
    // rel devs = +-0.5 -> rq = +-500000 -> sum sq = 5e11
    // se_rel = sqrt(1/2 * 0.5) = 0.5
    assert(se.getAs[Double]("se_rel") == 0.5)
    assert(se.getAs[Double]("se_abs") == 100.0)
  }

  test("pseudovalue mean reconstructs near the full ratio; SE sane") {
    val l = Tables.lineitem(spark, sf0001)
    val groups = Breadth163.jackknife(l).collect()
    val se = Breadth163.jackknifeSe(l).collect()(0)
    assert(se.getAs[Long]("g") == groups.length.toLong)
    val rHat = se.getAs[Double]("r_hat")
    val pvMean = groups.map(_.getAs[Double]("pseudovalue")).sum /
      groups.length
    // for a smooth estimator the pseudovalue mean is a bias-reduced
    // version of r_hat — close, not equal
    assert(math.abs(pvMean - rHat) / rHat < 0.01)
    assert(se.getAs[Double]("se_rel") >= 0.0)
    assert(se.getAs[Double]("se_rel") < 0.5)
    val devs = groups.map(_.getAs[Double]("dev"))
    assert(math.abs(devs.sum / devs.length) < se.getAs[Double]("se_rel")
      * rHat)
  }
}
