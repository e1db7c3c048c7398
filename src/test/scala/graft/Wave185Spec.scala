package graft

import graft.queries.Breadth176
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-seventy-seventh wave (Breadth176 DP
  * release). */
class Wave185Spec extends SparkSpec {

  test("noise matches a driver-side inverse-CDF recompute per cell") {
    val d = Tables.documents(spark, sf0001)
    val got = Breadth176.dpHistogram(d).collect()
    assert(got.nonEmpty)
    def md5hex(s: String) = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    got.foreach { r =>
      val key = s"dp#${r.getAs[String]("source")}#${r.getAs[String]("lang")}"
      val u = java.lang.Long.parseLong(md5hex(key).take(15), 16)
        .toDouble / Breadth176.Pow60.toDouble
      val sign = if (u >= 0.5) 1.0 else -1.0
      val ln6 = BigDecimal(math.log(1.0 - 2.0 * math.abs(u - 0.5)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val want = -Breadth176.InvEps * sign * ln6
      assert(math.abs(r.getAs[Double]("noise") - want) < 1e-12,
        s"$key: ${r.getAs[Double]("noise")} vs $want")
      assert(r.getAs[Double]("noisy_count") ==
        r.getAs[Long]("n").toDouble + r.getAs[Double]("noise"))
    }
  }

  test("noise is Laplace-shaped: signed, heavy-tailed, mean near 0") {
    val d = Tables.documents(spark, sf0001)
    val noises = Breadth176.dpHistogram(d).collect()
      .map(_.getAs[Double]("noise"))
    assert(noises.exists(_ > 0) && noises.exists(_ < 0))
    // scale b = 2 -> mean |noise| ~ 2; accept a generous band
    val mae = noises.map(math.abs).sum / noises.length
    assert(mae > 0.5 && mae < 6.0, s"mae $mae")
  }

  test("utility accountant is consistent with the histogram") {
    val d = Tables.documents(spark, sf0001)
    val cells = Breadth176.dpHistogram(d).collect()
    val u = Breadth176.dpUtility(d).collect()(0)
    assert(u.getAs[Double]("eps") == 0.5)
    assert(u.getAs[Long]("n_cells") == cells.length.toLong)
    val maxAe = cells.map(r => math.abs(r.getAs[Double]("noise"))).max
    assert(u.getAs[Double]("max_abs_err") == maxAe)
    val share = cells.count(r =>
      math.abs(r.getAs[Double]("noise")) > 5.0).toDouble / cells.length
    assert(u.getAs[Double]("share_off_by_5") == share)
    val mae = u.getAs[Double]("mean_abs_err")
    val driverMae = cells.map(r =>
      math.abs(r.getAs[Double]("noise"))).sum / cells.length
    assert(math.abs(mae - driverMae) < 1e-5)
  }
}
