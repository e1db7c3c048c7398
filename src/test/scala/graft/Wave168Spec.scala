package graft

import graft.queries.Breadth159
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-sixtieth wave (Breadth159 lift deciles and
  * Brier decomposition). */
class Wave168Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, Long)]) =
    rows.map { case (id, lang, nc) =>
      (id, s"doc $id", lang, "web", nc)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("hand gains: a perfect ranker captures everything in the top " +
    "deciles") {
    // 20 docs, top-10 scores all 'en' (positives), bottom-10 all 'fr'.
    val rows = (0 until 20).map { i =>
      (i.toLong, if (i < 10) "en" else "fr", (1000 - i).toLong)
    }
    val got = Breadth159.liftDeciles(docs(rows)).collect()
    assert(got.length == 10)
    // each decile holds 2 rows; deciles 0-4 pure positive, 5-9 pure neg
    got.foreach { r =>
      val d = r.getAs[Long]("decile")
      assert(r.getAs[Long]("n_rows") == 2L)
      if (d <= 4) {
        assert(r.getAs[Double]("pos_rate") == 1.0)
        assert(r.getAs[Double]("lift") == 2.0) // 1.0 / base 0.5
      } else {
        assert(r.getAs[Double]("pos_rate") == 0.0)
        assert(r.getAs[Double]("lift") == 0.0)
      }
    }
    val gains = got.sortBy(_.getAs[Long]("decile"))
      .map(_.getAs[Double]("cum_gain"))
    assert(gains.take(5).toSeq == Seq(0.2, 0.4, 0.6, 0.8, 1.0))
    assert(gains.drop(5).forall(_ == 1.0))
  }

  test("gains curve is monotone and ends at 1; lift averages to 1") {
    val d = Tables.documents(spark, sf0001)
    val got = Breadth159.liftDeciles(d).collect()
      .sortBy(_.getAs[Long]("decile"))
    val gains = got.map(_.getAs[Double]("cum_gain"))
    assert(gains.zip(gains.tail).forall { case (a, b) => a <= b })
    assert(gains.last == 1.0)
    val n = got.map(_.getAs[Long]("n_rows")).sum
    val weightedLift = got.map(r =>
      r.getAs[Double]("lift") * r.getAs[Long]("n_rows")).sum / n
    assert(math.abs(weightedLift - 1.0) < 1e-12)
  }

  test("Brier decomposition: components are bounded and the identity " +
    "holds up to the within-bin residual") {
    val d = Tables.documents(spark, sf0001)
    val r = Breadth159.brierDecomp(d).collect()(0)
    val brier = r.getAs[Double]("brier")
    val rel = r.getAs[Double]("reliability")
    val res = r.getAs[Double]("resolution")
    val unc = r.getAs[Double]("uncertainty")
    val resid = r.getAs[Double]("residual")
    assert(brier >= 0.0 && brier <= 1.0)
    assert(rel >= 0.0 && res >= 0.0)
    assert(unc >= 0.0 && unc <= 0.25)
    assert(res <= unc + 1e-9, "resolution cannot exceed uncertainty")
    assert(math.abs(brier - (rel - res + unc + resid)) < 1e-12)
    // p is ~uniform and independent of y: within-bin forecast variance
    // of a uniform decile is ~1/1200; residual stays in that ballpark.
    assert(math.abs(resid) < 0.01)
  }

  test("constant forecast: reliability carries everything, residual 0") {
    // all docs share n_chars = 50 -> p constant 50/101; one bin.
    val rows = (0 until 10).map { i =>
      (i.toLong, if (i < 3) "en" else "fr", 50L)
    }
    val r = Breadth159.brierDecomp(docs(rows)).collect()(0)
    assert(r.getAs[Double]("resolution") == 0.0)
    val p = 50.0 / 101.0
    // mean_p inherits wave 139's 1e-6 row quantization, so the
    // reliability term (and hence the residual) carries an O(1e-6·|p-y̅|)
    // quantization floor even for a constant forecast.
    assert(math.abs(r.getAs[Double]("reliability") - (p - 0.3) * (p - 0.3))
      < 1e-6)
    assert(math.abs(r.getAs[Double]("residual")) < 1e-6)
  }
}
