package graft

import graft.queries.Breadth35
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the thirty-fifth wave (Breadth35 impulse
  * classes, dedup sensitivity curve, cluster mixture). */
class Wave35Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long, String)]) =
    rows.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", lit("{}"))

  private def day(i: Int) =
    java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1).toString + " 10:00:00"

  private def series(closes: Seq[Long], key: Long = 1L) =
    closes.zipWithIndex.map { case (c, i) =>
      (key, c.toDouble / 100.0, i.toLong + 1, day(i + 1))
    }

  test("elderImpulse: the hand fold pins the classes; a sustained rise " +
    "turns green, a sustained fall red, a flat series stays blue") {
    val closes = Seq(1000L, 1050L, 1110L, 1180L, 1100L, 1000L, 900L,
      905L, 910L)
    val got = Breadth35.elderImpulse(ticks(series(closes)),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("impulse").as[String].collect().toSeq
    var st: Option[Breadth35.ImpulseAcc] = None
    val want = closes.map { c =>
      val (a, cls) = Breadth35.impulseStep(st, c)
      st = Some(a)
      cls
    }
    assert(got === want)
    assert(got.head === "blue")
    assert(got.contains("green") && got.contains("red"))
    val flat = Breadth35.elderImpulse(ticks(series(Seq.fill(5)(1200L),
      key = 2L)), "user_id", "ts", "value", "event_id")
      .select("impulse").as[String].collect().toSeq
    assert(flat.forall(_ === "blue"))
  }

  test("dedupSensitivity: the curve is monotone non-increasing in both " +
    "counts, the 0.80 point equals the full pair chain, and every " +
    "configured threshold appears") {
    val got = Breadth35.dedupSensitivity(spark, "/root/testdata/sf0.001")
      .orderBy("threshold")
      .select("threshold", "n_pairs", "n_docs")
      .as[(Double, Long, Long)].collect().toSeq
    assert(got.map(_._1) === Breadth35.SensThresholds)
    got.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a._2 >= b._2 && a._3 >= b._3, "monotone curve")
      case _ =>
    }
    // recompute the chain with the canonical parameters (Extensions:
    // shingle 3, 12 hashes, 4 bands, threshold 0.8)
    val full = graft.dedup.Dedup.minhashNearDups(
      Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text",
      3, 12, 4, 0.8).count()
    assert(got.head._2 === full, "0.80 point = the whole chain")
    // docs <= 2·pairs, and each scored threshold has sane counts
    got.foreach { case (_, p, d) => assert(d <= 2 * p) }
  }

  test("clusterMixture: sizes sum to the corpus, shares sum to 1, and " +
    "every cluster matches the assignment's own group sizes") {
    val dir = "/root/testdata/sf0.001"
    val got = Breadth35.clusterMixture(spark, dir)
      .orderBy("cluster").select("cluster", "n_vecs", "share")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    val total = graft.queries.Extensions12.kmeansAssign(
      Tables.embeddings(spark, dir)).count()
    assert(got.map(_._2).sum === total)
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-9)
    got.foreach { case (_, n, s) =>
      assert(s === n.toDouble / total.toDouble)
    }
  }
}
