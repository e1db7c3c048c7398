package graft

import graft.queries.Breadth138
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-thirty-ninth wave (Breadth138 classifier
  * evaluation: AUC / average precision / calibration). */
class Wave146Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String, Long)]) =
    rows.toDF("doc_id", "lang", "source", "n_chars")
      .withColumn("text", lit("x"))

  test("AUC = 1 for perfect separation, 0 for perfect inversion") {
    val perfect = docs(Seq(
      (1L, "en", "s", 100L), (2L, "en", "s", 90L),
      (3L, "de", "s", 10L), (4L, "de", "s", 20L)))
    val got = Breadth138.auc(perfect).collect().head
    assert(got.getAs[Double]("auc") == 1.0)
    val inverted = docs(Seq(
      (1L, "en", "s", 1L), (2L, "en", "s", 2L),
      (3L, "de", "s", 10L), (4L, "de", "s", 20L)))
    assert(Breadth138.auc(inverted).collect().head
      .getAs[Double]("auc") == 0.0)
  }

  test("AUC handles ties by average rank: all-tied scores give 0.5") {
    val tied = docs(Seq(
      (1L, "en", "s", 7L), (2L, "en", "s", 7L),
      (3L, "de", "s", 7L), (4L, "de", "s", 7L)))
    assert(Breadth138.auc(tied).collect().head.getAs[Double]("auc") == 0.5)
  }

  test("AUC known mixed case: one inversion among 2x2 = 0.75") {
    // pos scores {3, 1}, neg scores {2, 0}: pairs won = 3 of 4
    val d = docs(Seq(
      (1L, "en", "s", 3L), (2L, "en", "s", 1L),
      (3L, "de", "s", 2L), (4L, "de", "s", 0L)))
    assert(Breadth138.auc(d).collect().head.getAs[Double]("auc") == 0.75)
  }

  test("average precision of ranking [pos, neg, pos] = (1 + 2/3)/2") {
    val d = docs(Seq(
      (1L, "en", "s", 30L), (2L, "de", "s", 20L), (3L, "en", "s", 10L)))
    val got = Breadth138.avgPrecision(d).collect().head
    assert(got.getAs[Long]("n_pos") == 2L)
    val want = (1.0e9.floor + (2.0 / 3.0 * 1.0e9 + 0.5).floor) / (1.0e9 * 2)
    assert(got.getAs[Double]("avg_precision") == want)
  }

  test("average precision tie-break is doc_id ASC within equal scores") {
    // equal scores: doc 1 (pos) ranks before doc 2 (neg) => AP = 1.0
    val d = docs(Seq((1L, "en", "s", 5L), (2L, "de", "s", 5L)))
    assert(Breadth138.avgPrecision(d).collect().head
      .getAs[Double]("avg_precision") == 1.0)
  }

  test("calibration bins cover deciles and Brier is 0 for a perfect " +
    "0/1 predictor") {
    // n_chars % 101 == 0 -> p = 0 exactly (bin 0); y = 0 => brier 0
    val d = docs(Seq((1L, "de", "s", 101L), (2L, "de", "s", 202L)))
    val got = Breadth138.calibration(d).collect()
    assert(got.length == 1 && got.head.getAs[Long]("bin") == 0L)
    assert(got.head.getAs[Double]("brier") == 0.0)
    assert(got.head.getAs[Double]("mean_p") == 0.0)
  }

  test("calibration on sf0.001 has 10 bins, counts sum to corpus size") {
    val got = Breadth138.calibration(Tables.documents(spark, sf0001))
      .collect()
    assert(got.map(_.getAs[Long]("bin")).toSeq == (0L to 9L))
    assert(got.map(_.getAs[Long]("n")).sum == 500L)
    got.foreach { r =>
      val mp = r.getAs[Double]("mean_p")
      assert(mp >= r.getAs[Long]("bin") / 10.0 - 1e-9 &&
        mp <= (r.getAs[Long]("bin") + 1) / 10.0 + 1e-9)
    }
  }

  test("AUC on sf0.001 is per-source, finite, and within [0, 1]") {
    val got = Breadth138.auc(Tables.documents(spark, sf0001)).collect()
    assert(got.length == 20)
    got.foreach { r =>
      val a = r.getAs[Double]("auc")
      assert(a >= 0.0 && a <= 1.0)
      assert(r.getAs[Long]("n_pos") > 0 && r.getAs[Long]("n_neg") > 0)
    }
  }
}
