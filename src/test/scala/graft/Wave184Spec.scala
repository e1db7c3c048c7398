package graft

import graft.queries.Breadth175
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-seventy-sixth wave (Breadth175 synthetic
  * control + placebo). */
class Wave184Spec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, String, Double)]) =
    rows.zipWithIndex.map { case ((uid, day, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(s"$day 12:00:00"), uid,
        "view", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("a donor twin drives the counterfactual: zero effect for a " +
    "parallel treated series") {
    // cohort 0 (treated) and cohort 1 (donor, user 8%7=1) identical
    // every day; other cohorts constant at a different level.
    val days = (1 to 28).map(d => f"2024-01-$d%02d")
    val rows = days.flatMap { d =>
      Seq((7L, d, 100.0), (8L, d, 100.0), (9L, d, 55.0), (10L, d, 55.0),
        (11L, d, 55.0), (12L, d, 55.0), (13L, d, 55.0))
    }
    val got = Breadth175.synthControl(ev(rows)).collect()
    assert(got.length == 14) // Jan 15-28
    got.foreach { r =>
      // the twin donor gets overwhelming weight (pre-MSE 0 vs > 0)
      assert(math.abs(r.getAs[Double]("effect_cents")) < 1.0,
        s"${r.getAs[Double]("effect_cents")}")
      assert(r.getAs[Long]("treated_cents") == 10000L)
    }
  }

  test("an injected post-period lift is recovered and ranks first " +
    "among placebos") {
    val days = (1 to 28).map(d => f"2024-01-$d%02d")
    val rows = days.flatMap { d =>
      val lift = if (d >= "2024-01-15") 40.0 else 0.0
      Seq((7L, d, 100.0 + lift), (8L, d, 100.0), (9L, d, 100.0),
        (10L, d, 100.0), (11L, d, 100.0), (12L, d, 100.0),
        (13L, d, 100.0))
    }
    val got = Breadth175.synthControl(ev(rows)).collect()
    got.foreach { r =>
      assert(math.abs(r.getAs[Double]("effect_cents") - 4000.0) < 1.0)
    }
    val pl = Breadth175.placebo(ev(rows)).collect()
      .map(r => r.getAs[Long]("tg") ->
        (r.getAs[Double]("mean_effect_cents"), r.getAs[Long]("abs_rank")))
      .toMap
    assert(pl(0L)._2 == 1L, s"treated should rank first: $pl")
    assert(math.abs(pl(0L)._1 - 4000.0) < 1.0)
  }

  test("real corpus: placebo table covers all cohorts with a " +
    "permutation of ranks") {
    val e = Tables.events(spark, sf0001)
    val pl = Breadth175.placebo(e).collect()
    assert(pl.length == 7)
    assert(pl.map(_.getAs[Long]("abs_rank")).sorted.toSeq == (1L to 7L))
    val sc = Breadth175.synthControl(e).collect()
    assert(sc.length == 16) // Jan 15-30
    sc.foreach { r =>
      val eff = r.getAs[Double]("effect_cents")
      // (y*1000 - c)/1000 vs y - c/1000 differ by float rounding only
      assert(math.abs(eff - (r.getAs[Long]("treated_cents") -
        r.getAs[Double]("synth_cents"))) < 1e-8)
    }
  }
}
