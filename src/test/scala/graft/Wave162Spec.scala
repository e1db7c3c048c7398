package graft

import graft.queries.Breadth153
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-fifty-fourth wave (Breadth153 training
  * schedule: temperature mixing + epoch ordering). */
class Wave162Spec extends SparkSpec {
  import spark.implicits._

  test("temperature mixing up-samples the small source (alpha = 0.5 " +
    "exact on perfect squares)") {
    // sources of 100 and 400 docs: weights 10 and 20 -> temp shares
    // 1/3 and 2/3 (vs raw 0.2 / 0.8); oversample small = (1/3)/0.2
    val d = ((1 to 100).map(i => (i.toLong, "small")) ++
      (101 to 500).map(i => (i.toLong, "big")))
      .toDF("doc_id", "source").withColumn("text", lit("x"))
      .withColumn("lang", lit("en")).withColumn("n_chars", lit(1L))
    val got = Breadth153.temperatureMix(d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got("small").getAs[Double]("share_temp") == 1e7 / 3.0e7)
    assert(got("big").getAs[Double]("share_temp") == 2e7 / 3.0e7)
    assert(got("small").getAs[Double]("oversample") > 1.0)
    assert(got("big").getAs[Double]("oversample") < 1.0)
  }

  test("every epoch is a complete permutation and epochs disagree") {
    val d = (1L to 50L).toDF("doc_id")
    val ranks = Breadth153.epochRanks(d).collect()
      .groupBy(_.getAs[Long]("epoch"))
    (1L to 3L).foreach { e =>
      val ord = ranks(e).sortBy(_.getAs[Long]("pos"))
        .map(_.getAs[Long]("doc_id"))
      assert(ord.sorted.toSeq == (1L to 50L), s"epoch $e permutes all")
    }
    val o1 = ranks(1L).sortBy(_.getAs[Long]("pos"))
      .map(_.getAs[Long]("doc_id")).toSeq
    val o2 = ranks(2L).sortBy(_.getAs[Long]("pos"))
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(o1 != o2, "different epochs visit in different orders")
  }

  test("sf0.001: mix shares sum to 1 (quantization-tight) and the " +
    "epoch head is stable across runs") {
    val d = Tables.documents(spark, sf0001)
    val mix = Breadth153.temperatureMix(d).collect()
    val s = mix.map(_.getAs[Double]("share_temp")).sum
    assert(math.abs(s - 1.0) < 1e-9)
    val a = Breadth153.epochOrderHead(d).collect().map(_.toString).toSeq
    val b = Breadth153.epochOrderHead(d).collect().map(_.toString).toSeq
    assert(a == b && a.length == 15)
  }
}
