package graft

import graft.queries.Breadth160
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-sixty-first wave (Breadth160 McNemar and
  * Cochran's Q over the quality gates). */
class Wave169Spec extends SparkSpec {
  import spark.implicits._

  // enough tokens to pass the length gate; distinct texts avoid dedup
  private def longText(id: Long) =
    (0 until 25).map(k => s"tok${id}x$k").mkString(" ")

  test("hand cells: McNemar matches the 2x2 formula") {
    val docs = Tables.documents(spark, sf0001)
    val flags = queries.Breadth148.gateFlags(docs).collect()
    val b = flags.count(r =>
      r.getAs[Boolean]("len_ok") && !r.getAs[Boolean]("keep")).toLong
    val c = flags.count(r =>
      !r.getAs[Boolean]("len_ok") && r.getAs[Boolean]("keep")).toLong
    val got = Breadth160.mcnemar(docs).collect()(0)
    assert(got.getAs[Long]("b") == b)
    assert(got.getAs[Long]("c") == c)
    if (b + c > 0) {
      assert(got.getAs[Double]("mcnemar") ==
        ((b - c) * (b - c)).toDouble / (b + c).toDouble)
      assert(got.getAs[Double]("mcnemar_cc") ==
        ((math.abs(b - c) - 1) * (math.abs(b - c) - 1)).toDouble /
          (b + c).toDouble)
    }
    assert(got.getAs[Double]("agree_share") >= 0.0)
    assert(got.getAs[Double]("agree_share") <= 1.0)
  }

  test("Cochran's Q matches a driver-side recompute and is nonnegative") {
    val docs = Tables.documents(spark, sf0001)
    val flags = queries.Breadth148.gateFlags(docs).collect()
    val gs = flags.map { r =>
      Seq(r.getAs[Boolean]("len_ok"), r.getAs[Boolean]("surv_full"),
        r.getAs[Boolean]("keep")).map(x => if (x) 1L else 0L)
    }
    val t = (0 until 3).map(j => gs.map(_(j)).sum)
    val s = t.sum
    val sr2 = gs.map(r => { val x = r.sum; x * x }).sum
    val expected =
      if (3 * s - sr2 == 0) None
      else Some((2 * (3 * t.map(x => x * x).sum - s * s)).toDouble /
        (3 * s - sr2).toDouble)
    val got = Breadth160.cochranQ(docs).collect()(0)
    assert(got.getAs[Long]("t1") == t(0))
    assert(got.getAs[Long]("t2") == t(1))
    assert(got.getAs[Long]("t3") == t(2))
    expected match {
      case Some(q) =>
        assert(got.getAs[Double]("q_stat") == q)
        assert(q >= 0.0)
      case None => assert(got.isNullAt(got.fieldIndex("q_stat")))
    }
  }

  test("identical gates give Q = 0; a unanimous corpus gives NULL") {
    // All docs pass every gate -> every R_i = k -> denominator 0 -> NULL.
    val uni = (0 until 8).map(i => (i.toLong, longText(i), "en", "web",
      500L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Breadth160.cochranQ(uni).collect()(0)
    // all three gates pass everything on this corpus (distinct long
    // texts, KN keep is corpus-mean based; if keep splits, Q is just
    // finite) — accept NULL or a finite nonnegative value, but pin the
    // degenerate path when it occurs.
    if (got.isNullAt(got.fieldIndex("q_stat"))) {
      assert(got.getAs[Long]("t1") == 8L)
      assert(got.getAs[Long]("t2") == 8L)
    } else assert(got.getAs[Double]("q_stat") >= 0.0)
  }

  test("two identical classifiers have no discordant pairs") {
    // text and n_chars aligned so len_ok == keep is not forced; instead
    // pin the b=c=0 NULL guard by construction: all docs pass length
    // and (by corpus-mean construction on a 1-doc corpus) the KN gate.
    val one = Seq((1L, longText(1), "en", "web", 500L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Breadth160.mcnemar(one).collect()(0)
    if (got.getAs[Long]("b") + got.getAs[Long]("c") == 0) {
      assert(got.isNullAt(got.fieldIndex("mcnemar")))
      assert(got.isNullAt(got.fieldIndex("mcnemar_cc")))
      assert(got.getAs[Double]("agree_share") == 1.0)
    }
  }
}
