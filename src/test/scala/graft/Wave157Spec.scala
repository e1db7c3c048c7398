package graft

import graft.queries.Breadth148
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-forty-ninth wave (Breadth148 pipeline
  * yield + gate overlap). */
class Wave157Spec extends SparkSpec {
  import spark.implicits._

  private val long1 = (1 to 25).map(i => "tok" + i).mkString(" ")
  private val long2 = (1 to 25).map(i => "alt" + i).mkString(" ")

  test("funnel: short docs fall at stage 1, exact dupes at stage 2, " +
    "the survivor keeps the smallest doc_id") {
    val d = Seq(
      (1L, long1), (2L, long1), // dupes: 1 survives
      (3L, long2),
      (4L, "too short"), (5L, "also short"))
      .toDF("doc_id", "text")
    val y = Breadth148.pipelineYield(d).collect()
      .map(r => r.getAs[Long]("stage_id") ->
        (r.getAs[Long]("n_in"), r.getAs[Long]("n_out"))).toMap
    assert(y(1L) == (5L, 3L), "length gate")
    assert(y(2L) == (3L, 2L), "exact dedup among survivors")
    assert(y(3L)._1 == 2L && y(3L)._2 <= 2L, "ppl gate bounded")
    val flags = Breadth148.gateFlags(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("surv_seq"))
      .toMap
    assert(flags(1L) && !flags(2L), "min doc_id survives")
  }

  test("sequential dedup differs from full-corpus dedup when a dupe's " +
    "minimum is length-rejected") {
    // doc 1 short, doc 2 long, same TEXT hash impossible (length in
    // text) -> craft: 1 and 2 share text (short), 3 long unique:
    // full-corpus survivor of the pair is 1; sequentially both fall
    // at stage 1 so neither reaches dedup
    val d = Seq((1L, "dup text"), (2L, "dup text"), (3L, long1))
      .toDF("doc_id", "text")
    val f = Breadth148.gateFlags(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("surv_seq"), r.getAs[Boolean]("surv_full")))
      .toMap
    assert(f(1L) == (false, true), "full-dedup survivor, length-dead")
    assert(f(2L) == (false, false))
    assert(f(3L) == (true, true))
  }

  test("sf0.001: funnel chains (n_out_k == n_in_{k+1}), yields in " +
    "(0,1], overlap cells partition the corpus") {
    val docs = Tables.documents(spark, sf0001)
    val y = Breadth148.pipelineYield(docs).collect()
      .sortBy(_.getAs[Long]("stage_id"))
    assert(y.length == 3)
    assert(y(0).getAs[Long]("n_out") == y(1).getAs[Long]("n_in"))
    assert(y(1).getAs[Long]("n_out") == y(2).getAs[Long]("n_in"))
    y.foreach { r =>
      val fr = r.getAs[Double]("yield_frac")
      assert(fr > 0.0 && fr <= 1.0)
    }
    val ov = Breadth148.gateOverlap(docs).collect()
    assert(ov.map(_.getAs[Long]("n")).sum == 500L)
  }
}
