package graft

import graft.queries.Breadth177
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-seventy-eighth wave (Breadth177 IPW/ATT). */
class Wave186Spec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Int, Double)]) =
    rows.zipWithIndex.map { case ((uid, _, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-05 12:00:00"), uid,
        "view", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("propensity table: weights are the integer odds of the counts " +
    "and rates track the design at sf0.01") {
    val e = Tables.events(spark, "/root/testdata/sf0.01")
    val pt = Breadth177.propensityTable(e).collect()
    assert(pt.length == 4)
    pt.foreach { r =>
      val t = r.getAs[Long]("n_treated"); val n = r.getAs[Long]("n")
      if (n > t) {
        assert(r.getAs[Long]("w_1e6") == t * 1000000L / (n - t))
      }
      val q = r.getAs[Long]("quartile")
      val design = 0.20 + 0.15 * q
      // ~37 users per quartile: allow +-4 sigma of binomial noise
      assert(math.abs(r.getAs[Double]("p_hat") - design) < 0.33,
        s"q$q: ${r.getAs[Double]("p_hat")} vs $design")
    }
    val p = pt.map(r => r.getAs[Long]("quartile") ->
      r.getAs[Double]("p_hat")).toMap
    assert(p(3L) > p(0L), "treatment rate must rise with activity")
  }

  test("hand confounder: outcome constant within quartile makes IPW " +
    "exactly unbiased while the naive diff is inflated") {
    // users 1-20: 5 events of 10.0 (low activity, low spend);
    // users 21-40: 40 events of 100.0 (high activity, high spend).
    val rows =
      (1L to 20L).flatMap(u => Seq.fill(5)((u, 0, 10.0))) ++
        (21L to 40L).flatMap(u => Seq.fill(40)((u, 0, 100.0)))
    val data = ev(rows)
    val pt = Breadth177.propensityTable(data).collect()
    val degenerate = pt.exists(r =>
      r.getAs[Long]("n_treated") == 0L ||
        r.getAs[Long]("n_treated") == r.getAs[Long]("n"))
    val r = Breadth177.ipwAtt(data).collect()(0)
    val naive = r.getAs[Double]("naive_diff_cents")
    val att = r.getAs[Double]("att_ipw_cents")
    if (!degenerate) {
      // within-quartile-constant outcome: weighted control mean ==
      // treated mean up to the 1e-6 weight truncation
      assert(math.abs(att) < math.abs(naive) / 100.0,
        s"naive $naive att $att")
    } else {
      // deterministic md5 draw landed a degenerate stratum: the
      // estimator still runs; just pin the bias direction
      assert(math.abs(att) <= math.abs(naive) + 1.0)
    }
  }

  test("weighted control mean reproduces a driver-side recompute") {
    val e = Tables.events(spark, sf0001)
    val u = Breadth177.users(e).collect()
    val pt = Breadth177.propensityTable(e).collect()
      .map(r => r.getAs[Long]("quartile") -> r.getAs[Long]("w_1e6")).toMap
    val treated = u.filter(_.getAs[Boolean]("treated"))
    val controls = u.filter(!_.getAs[Boolean]("treated"))
    val yt = treated.map(_.getAs[Long]("__y")).sum.toDouble / treated.length
    val wy = controls.map(r =>
      pt(r.getAs[Long]("quartile")) * r.getAs[Long]("__y")).sum
    val ws = controls.map(r => pt(r.getAs[Long]("quartile"))).sum
    val want = yt - wy.toDouble / ws.toDouble
    val got = Breadth177.ipwAtt(e).collect()(0)
      .getAs[Double]("att_ipw_cents")
    assert(math.abs(got - want) < 1e-9 * math.abs(want))
  }
}
