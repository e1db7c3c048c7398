package graft

import graft.queries.Breadth144
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-forty-fifth wave (Breadth144 DiD + Cohen's
  * kappa). */
class Wave152Spec extends SparkSpec {
  import spark.implicits._

  test("hand-computed 2x2 DiD: parallel-trends violation is the " +
    "estimate") {
    // days 1-4, mid = day 2 (post = days 3-4)
    // treated (even users): pre mean 1.00, post mean 3.00 (+2.00)
    // control (odd users):  pre mean 1.00, post mean 1.50 (+0.50)
    val rows = Seq(
      (2L, "2024-01-01", 1.00), (2L, "2024-01-03", 3.00),
      (4L, "2024-01-02", 1.00), (4L, "2024-01-04", 3.00),
      (1L, "2024-01-01", 1.00), (1L, "2024-01-03", 1.50),
      (3L, "2024-01-02", 1.00), (3L, "2024-01-04", 1.50))
    val ev = rows.toDF("user_id", "d", "value")
      .select(col("user_id"), to_timestamp_ntz(col("d")).as("ts"),
        col("value"))
    val got = Breadth144.did(ev).collect().head
    assert(got.getAs[Long]("n_t_pre") == 2L &&
      got.getAs[Long]("n_c_post") == 2L)
    assert(got.getAs[Double]("mean_t_post") == 3.0)
    assert(got.getAs[Double]("did") == 1.5)
  }

  test("kappa = 1 on perfect agreement, 0 for a constant rater") {
    val perfect = Seq(
      (1L, "the a of and", "en"), (2L, "der die und", "de"),
      (3L, "the of is", "en"), (4L, "das ist der", "de"))
      .toDF("doc_id", "text", "lang")
    val kp = Breadth144.cohenKappa(perfect).collect().head
    assert(kp.getAs[Double]("kappa") == 1.0)
    // every text carries only de markers -> constant 'de' prediction;
    // po == pe algebraically -> kappa exactly 0
    val const = Seq(
      (1L, "der die und", "de"), (2L, "der das ist", "en"),
      (3L, "die und das", "de"), (4L, "ist der die", "en"))
      .toDF("doc_id", "text", "lang")
    val k0 = Breadth144.cohenKappa(const).collect().head
    assert(k0.getAs[Double]("kappa") == 0.0)
    assert(k0.getAs[Double]("po") == k0.getAs[Double]("pe"))
  }

  test("sf0.001: DiD cells partition the events; kappa sits strictly " +
    "between the constant-rater floor and perfect agreement") {
    val d = Breadth144.did(Tables.events(spark, sf0001)).collect().head
    assert(d.getAs[Long]("n_t_pre") + d.getAs[Long]("n_t_post")
      + d.getAs[Long]("n_c_pre") + d.getAs[Long]("n_c_post") == 1000L)
    val k = Breadth144.cohenKappa(Tables.documents(spark, sf0001))
      .collect().head
    assert(k.getAs[Long]("n") == 500L)
    // the synthetic corpus shares one vocabulary across langs (no
    // lexical signal), so the chance-corrected agreement must sit AT
    // chance — kappa near 0 is the correct measurement here
    val kappa = k.getAs[Double]("kappa")
    assert(math.abs(kappa) < 0.1, s"marker heuristic kappa: $kappa")
  }
}
