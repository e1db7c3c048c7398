package graft

import graft.queries.Breadth164
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-sixty-fifth wave (Breadth164 Friedman test
  * and Kendall's W). */
class Wave173Spec extends SparkSpec {
  import spark.implicits._

  private def orders(rows: Seq[(Long, String, String, Double)]) =
    rows.zipWithIndex.map { case ((k, month, pri, price), _) =>
      (k, 1L, "O", price,
        java.sql.Timestamp.valueOf(s"$month-15 00:00:00"), pri)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")

  test("perfect concordance across blocks gives W = 1 and the " +
    "textbook chi2") {
    // 3 months, 3 priorities, identical ordering 1 < 2 < 3 every month.
    val rows = for {
      m <- Seq("1995-01", "1995-02", "1995-03")
      (p, v) <- Seq(("1-U", 100.0), ("2-H", 200.0), ("3-M", 300.0))
    } yield (rows2Key(m, p), m, p, v)
    val r = Breadth164.friedman(orders(rows)).collect()(0)
    assert(r.getAs[Long]("n_blocks") == 3L)
    assert(r.getAs[Long]("k") == 3L)
    // chi2_F = n(k-1)W = 3*2*1 = 6
    assert(r.getAs[Double]("kendall_w") == 1.0)
    assert(r.getAs[Double]("chi2_f") == 6.0)
    val ranks = Breadth164.friedmanRanks(orders(rows)).collect()
    assert(ranks.map(_.getAs[Long]("pri")).toSeq == Seq(1L, 2L, 3L))
    assert(ranks.map(_.getAs[Double]("mean_rank")).toSeq ==
      Seq(1.0, 2.0, 3.0))
  }

  private var keyCounter = 0L
  private def rows2Key(m: String, p: String): Long = {
    keyCounter += 1; keyCounter
  }

  test("rank churn drives W toward 0; incomplete blocks are dropped") {
    // 2 complete months with OPPOSITE orderings -> rank sums equal ->
    // W = 0, chi2 = 0. A third month missing priority 3 must be dropped.
    val rows = Seq(
      (101L, "1995-01", "1-U", 100.0), (102L, "1995-01", "2-H", 200.0),
      (103L, "1995-01", "3-M", 300.0),
      (104L, "1995-02", "1-U", 300.0), (105L, "1995-02", "2-H", 200.0),
      (106L, "1995-02", "3-M", 100.0),
      (107L, "1995-03", "1-U", 50.0), (108L, "1995-03", "2-H", 60.0))
    val r = Breadth164.friedman(orders(rows)).collect()(0)
    assert(r.getAs[Long]("n_blocks") == 2L)
    assert(r.getAs[Double]("kendall_w") == 0.0)
    assert(r.getAs[Double]("chi2_f") == 0.0)
  }

  test("ties get average ranks: a fully tied block contributes " +
    "identical rank sums") {
    val rows = Seq(
      (201L, "1995-01", "1-U", 100.0), (202L, "1995-01", "2-H", 100.0),
      (203L, "1995-01", "3-M", 100.0))
    val ranks = Breadth164.friedmanRanks(orders(rows)).collect()
    // average rank of a 3-way tie = 2 -> doubled sum = 4 each
    assert(ranks.map(_.getAs[Long]("rank_sum_2x")).toSet == Set(4L))
    assert(ranks.map(_.getAs[Double]("mean_rank")).toSet == Set(2.0))
  }

  test("real corpus: statistics are finite, W in [0,1], chi2 = " +
    "n(k-1)W identity holds (tie-free)") {
    val o = Tables.orders(spark, sf0001)
    val r = Breadth164.friedman(o).collect()(0)
    val w = r.getAs[Double]("kendall_w")
    val chi2 = r.getAs[Double]("chi2_f")
    val n = r.getAs[Long]("n_blocks")
    val k = r.getAs[Long]("k")
    assert(k == 5L)
    assert(n > 0L)
    assert(w >= 0.0 && w <= 1.0)
    // exact cent sums are tie-free on this corpus, so the classical
    // identity chi2 = n(k-1)W holds up to double arithmetic
    assert(math.abs(chi2 - n * (k - 1) * w) < 1e-9 * math.max(1.0, chi2))
    val ranks = Breadth164.friedmanRanks(o).collect()
    assert(ranks.length == 5)
    assert(ranks.map(_.getAs[Long]("rank_sum_2x")).sum ==
      2L * n * k * (k + 1) / 2L)
  }
}
