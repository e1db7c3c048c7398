package graft

import graft.queries.Breadth168
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-sixty-ninth wave (Breadth168 JSD per
  * source and median-of-means). */
class Wave177Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String)]) =
    rows.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("identical source and rest distributions give JSD ~ 0; " +
    "disjoint give ~ ln 2") {
    val same = docs(Seq(
      (1L, "a", "x y x y"), (2L, "b", "x y x y")))
    val r1 = Breadth168.jsDivergence(same).collect()
    r1.foreach(r => assert(math.abs(r.getAs[Double]("jsd_nats")) < 1e-5))

    val disj = docs(Seq(
      (1L, "a", "x x x x"), (2L, "b", "y y y y")))
    val r2 = Breadth168.jsDivergence(disj).collect()
    r2.foreach(r => assert(
      math.abs(r.getAs[Double]("jsd_nats") - math.log(2.0)) < 1e-5,
      s"${r.getAs[Double]("jsd_nats")}"))
  }

  test("real corpus: JSD bounded to [0, ln 2] for every source") {
    val d = Tables.documents(spark, sf0001)
    val rs = Breadth168.jsDivergence(d).collect()
    assert(rs.length > 1)
    rs.foreach { r =>
      val v = r.getAs[Double]("jsd_nats")
      assert(v >= -1e-6 && v <= math.log(2.0) + 1e-6, s"$v")
    }
    val tot = rs.map(_.getAs[Long]("n_tokens_src")).sum
    val expected = d.select(explode(
      graft.text.Text.tokens(col("text")))).count()
    assert(tot == expected)
  }

  test("median-of-means matches a driver-side recompute and resists " +
    "an injected corrupt tail") {
    val l = Tables.lineitem(spark, sf0001)
    val got = Breadth168.medianOfMeans(l).collect()(0)
    assert(got.getAs[Long]("g") == 16L)
    // recompute on the driver
    def md5hex(s: String) = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val rows = l.select(col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice")).collect()
    val groups = rows.groupBy { r =>
      java.lang.Long.parseLong(
        md5hex(s"mom#${r.getLong(0)}#${r.getInt(1)}").take(15), 16) % 16
    }
    val means = groups.toSeq
      .map { case (g, rs) =>
        val cents = rs.map(r => math.floor(r.getDouble(2) * 100 + 0.5)
          .toLong).sum
        (g, cents.toDouble / rs.length)
      }
      .sortBy { case (g, m) => (m, g) }
      .map(_._2)
    val mom = (means(7) + means(8)) / 2.0
    assert(got.getAs[Double]("mom_cents") == mom)
    // the robust estimator sits near the plain mean on clean data
    val mean = got.getAs[Double]("mean_cents")
    assert(math.abs(mom - mean) / mean < 0.1)
    // inject a corrupt group: multiply one group's prices 1000x;
    // MoM barely moves, the mean explodes
    val corrupt = l.withColumn("l_extendedprice",
      when(pmod(conv(substring(md5(concat(lit("mom#"),
        col("l_orderkey").cast("string"), lit("#"),
        col("l_linenumber").cast("string"))), 1, 15), 16, 10)
        .cast("long"), lit(16L)) === 0,
        col("l_extendedprice") * 1000).otherwise(col("l_extendedprice")))
    val got2 = Breadth168.medianOfMeans(corrupt).collect()(0)
    val momShift = math.abs(got2.getAs[Double]("mom_cents") - mom) / mom
    val meanShift = math.abs(got2.getAs[Double]("mean_cents") - mean) / mean
    assert(momShift < 0.2, s"mom shifted $momShift")
    assert(meanShift > 10.0, s"mean shifted only $meanShift")
  }
}
