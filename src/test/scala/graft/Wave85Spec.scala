package graft

import graft.queries.Breadth82
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the eighty-third wave (Breadth82 ANOVA /
  * Cramér's V / Kruskal-Wallis). */
class Wave85Spec extends SparkSpec {
  import spark.implicits._

  test("anovaF: two 3-element groups give the hand-computed F and eta^2") {
    // a: 1,2,3 (mean 2); b: 4,5,6 (mean 5); grand 3.5
    // SSB = 3*1.5^2*2 = 13.5; SSW = 2+2 = 4 -> F = 13.5/(4/4) = 13.5
    val docs = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 4L), ("b", 5L), ("b", 6L)).toDF("source", "n_chars")
    val r = Breadth82.anovaF(docs, "source", "n_chars").collect()(0)
    assert(r.getLong(0) === 6L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 13.5)
    assert(r.getDouble(3) === 0.771429) // 13.5/17.5 rounded
  }

  test("cramersV: an all-cells-nonzero 2x2 panel gives the hand chi2 " +
    "and V") {
    // counts (X,Jan)=3 (X,Feb)=1 (Y,Jan)=1 (Y,Feb)=3; e=2 everywhere
    // chi2 = 4 * (1/2) = 2; V = sqrt(2/(8*1)) = 0.5
    val rows =
      Seq.fill(3)(("X", "2024-01-05 00:00:00")) ++
        Seq(("X", "2024-02-05 00:00:00")) ++
        Seq(("Y", "2024-01-05 00:00:00")) ++
        Seq.fill(3)(("Y", "2024-02-05 00:00:00"))
    val e = rows.toDF("event_type", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val r = Breadth82.cramersV(e, "event_type", "ts").collect()(0)
    assert(r.getLong(0) === 8L && r.getLong(1) === 1L)
    assert(r.getDouble(2) === 2.0)
    assert(r.getDouble(3) === 0.5)
  }

  test("kruskal: a cross-group tie takes the average rank and the tie " +
    "correction divides through") {
    // a: 1,2; b: 3,3 -> ranks 1,2,3.5,3.5; H = 2.4; corr = 0.9
    val docs = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 3L))
      .toDF("source", "n_chars")
    val r = Breadth82.kruskal(docs, "source", "n_chars").collect()(0)
    assert(r.getLong(0) === 4L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 2.4)
    assert(r.getDouble(3) === 2.666667)
  }
}
