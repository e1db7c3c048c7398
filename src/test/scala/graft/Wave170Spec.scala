package graft

import graft.queries.Breadth161
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-sixty-second wave (Breadth161 ordinal
  * association and Theil's U). */
class Wave170Spec extends SparkSpec {
  import spark.implicits._

  private def orders(rows: Seq[(Long, String, Double)]) =
    rows.map { case (k, pri, price) =>
      (k, 1L, "O", price,
        java.sql.Timestamp.valueOf("1995-01-01 00:00:00"), pri)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")

  test("hand grid: perfect concordance gives gamma = D = tau_b = 1") {
    // 10 orders, priority digit == price quintile order exactly.
    val rows = (0 until 10).map { i =>
      (i.toLong, s"${i / 2 + 1}-X", 1000.0 + i * 100)
    }
    val r = Breadth161.ordinalAssoc(orders(rows)).collect()(0)
    assert(r.getAs[Long]("d_pairs") == 0L)
    assert(r.getAs[Double]("gamma") == 1.0)
    // every x tie is also a y tie on this grid (2 per cell): Tx
    // counts pairs tied on x but differing in y -> 0; likewise Ty = 0
    // ... except within-cell pairs tie on BOTH and never enter. With
    // 2 rows per (x=y) cell: Tx = Ty = 0, so D and tau_b are 1 too.
    assert(r.getAs[Long]("tx_pairs") == 0L)
    assert(r.getAs[Long]("ty_pairs") == 0L)
    assert(r.getAs[Double]("somers_d_yx") == 1.0)
    // the two-root denominator sqrt(a)*sqrt(a) is an ulp off a
    assert(math.abs(r.getAs[Double]("tau_b") - 1.0) < 1e-15)
  }

  test("hand grid: ties shrink D and tau_b below gamma") {
    // priorities 1,1,2,2 but prices all distinct: x ties exist,
    // y ties none. C = 4 (cross pairs), D = 0, Tx = 2 (within-x
    // price-differing pairs).
    val rows = Seq(
      (0L, "1-A", 100.0), (1L, "1-A", 200.0),
      (2L, "2-B", 300.0), (3L, "2-B", 400.0))
    val r = Breadth161.ordinalAssoc(orders(rows)).collect()(0)
    assert(r.getAs[Double]("gamma") == 1.0)
    assert(r.getAs[Long]("c_pairs") == 4L)
    assert(r.getAs[Long]("tx_pairs") == 2L)
    assert(r.getAs[Double]("somers_d_xy") == 4.0 / 6.0)
    assert(r.getAs[Double]("somers_d_yx") == 1.0)
    assert(r.getAs[Double]("tau_b") ==
      4.0 / (math.sqrt(6.0) * math.sqrt(4.0)))
  }

  test("statistics are bounded and consistently ordered on real data") {
    val o = Tables.orders(spark, sf0001)
    val r = Breadth161.ordinalAssoc(o).collect()(0)
    val gamma = r.getAs[Double]("gamma")
    val dyx = r.getAs[Double]("somers_d_yx")
    val taub = r.getAs[Double]("tau_b")
    Seq(gamma, dyx, taub).foreach(v => assert(v >= -1.0 && v <= 1.0))
    // |gamma| >= |tau_b| >= ... gamma has the smallest denominator
    assert(math.abs(gamma) >= math.abs(taub) - 1e-15)
    assert(math.abs(gamma) >= math.abs(dyx) - 1e-15)
  }

  test("Theil's U: independent columns give U ~ 0, identical give 1") {
    // lang == f(source) exactly -> H(lang|source) = 0 -> U(lang|src) = 1.
    val dep = (0 until 40).map { i =>
      val src = s"s${i % 4}"
      (i.toLong, s"t$i", s"L${i % 4}", src, 100L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val r1 = Breadth161.theilU(dep).collect()(0)
    assert(math.abs(r1.getAs[Double]("u_lang_given_source") - 1.0) < 1e-6)
    assert(math.abs(r1.getAs[Double]("mi") -
      r1.getAs[Double]("h_lang")) < 1e-6)

    // independent grid: every (source, lang) cell equal count -> MI 0.
    val ind = (0 until 40).map { i =>
      (i.toLong, s"t$i", s"L${i % 4}", s"s${(i / 4) % 2}", 100L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val r2 = Breadth161.theilU(ind).collect()(0)
    assert(math.abs(r2.getAs[Double]("mi")) < 1e-6)
    assert(math.abs(r2.getAs[Double]("u_lang_given_source")) < 1e-6)
  }

  test("real corpus: U values land in [0,1] and MI <= min entropy") {
    val d = Tables.documents(spark, sf0001)
    val r = Breadth161.theilU(d).collect()(0)
    val mi = r.getAs[Double]("mi")
    assert(mi >= -1e-9)
    assert(mi <= math.min(r.getAs[Double]("h_lang"),
      r.getAs[Double]("h_source")) + 1e-6)
    val u1 = r.getAs[Double]("u_lang_given_source")
    val u2 = r.getAs[Double]("u_source_given_lang")
    assert(u1 >= -1e-9 && u1 <= 1.0 + 1e-9)
    assert(u2 >= -1e-9 && u2 <= 1.0 + 1e-9)
  }
}
