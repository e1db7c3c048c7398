package graft

import graft.queries.Breadth147
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-forty-eighth wave (Breadth147 SPRT). */
class Wave155Spec extends SparkSpec {
  import spark.implicits._

  // value 0.04 -> cents 4 -> success; 0.01 -> cents 1 -> failure
  private def ev(rows: Seq[(String, Int, Double)]) =
    rows.map { case (t, i, v) =>
      (t, i.toLong, f"2024-01-01 00:00:${i}%02d", v)
    }.toDF("event_type", "event_id", "d", "value")
      .select(col("event_type"), col("event_id"),
        to_timestamp_ntz(col("d")).as("ts"), col("value"),
        lit(1L).as("user_id"))

  test("an all-failure stream crosses the lower bound at ceil(B/|f|) " +
    "observations and accepts H0") {
    val n = (Breadth147.BoundQ / -Breadth147.IncFail).toInt + 2
    val rows = (1 to n).map(i => ("a", i, 0.01))
    val got = Breadth147.sprt(ev(rows)).collect().head
    assert(got.getAs[String]("decision") == "accept_h0")
    val kd = got.getAs[Long]("n_at_decision")
    assert(kd == Breadth147.BoundQ / -Breadth147.IncFail + 1,
      s"first crossing index: $kd")
    assert(got.getAs[Long]("llr_at_decision") <= -Breadth147.BoundQ)
  }

  test("an all-success stream accepts H1; a short stream continues") {
    val n = (Breadth147.BoundQ / Breadth147.IncSucc).toInt + 2
    val succ = (1 to n).map(i => ("a", i, 0.04))
    val g1 = Breadth147.sprt(ev(succ)).collect().head
    assert(g1.getAs[String]("decision") == "accept_h1")
    val short = (1 to 3).map(i => ("b", i, 0.04))
    val g2 = Breadth147.sprt(ev(short)).collect().head
    assert(g2.getAs[String]("decision") == "continue")
    assert(g2.getAs[Long]("n_at_decision") == -1L)
  }

  test("trajectory head is the exact integer prefix sum") {
    val rows = Seq(("a", 1, 0.04), ("a", 2, 0.01), ("a", 3, 0.04))
    val got = Breadth147.sprtHead(ev(rows)).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Long]("llr")).toMap
    assert(got(1L) == Breadth147.IncSucc)
    assert(got(2L) == Breadth147.IncSucc + Breadth147.IncFail)
    assert(got(3L) == 2 * Breadth147.IncSucc + Breadth147.IncFail)
  }

  test("sf0.001: every stream decides or continues consistently with " +
    "its reported crossing LLR") {
    val got = Breadth147.sprt(Tables.events(spark, sf0001)).collect()
    assert(got.length == 5)
    got.foreach { r =>
      r.getAs[String]("decision") match {
        case "accept_h1" =>
          assert(r.getAs[Long]("llr_at_decision") >= Breadth147.BoundQ)
        case "accept_h0" =>
          assert(r.getAs[Long]("llr_at_decision") <= -Breadth147.BoundQ)
        case "continue" =>
          assert(r.getAs[Long]("n_at_decision") == -1L)
      }
    }
    assert(got.exists(_.getAs[String]("decision") != "continue"),
      "at ~21-25% conversion vs p0=25% some stream decides by n~200")
  }
}
