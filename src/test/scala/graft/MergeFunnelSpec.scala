package graft

import graft.ops.{Funnel, Merge}
import org.apache.spark.sql.functions._

/** Edge-case semantics for the CDC merge and the ordered funnel — the
  * cases the DuckDB differential can't isolate (the oracle mirrors the
  * same formulation; these pin the intended MERGE/funnel semantics on
  * adversarial fixtures).
  */
class MergeFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def changes(rows: (Long, Double, Boolean)*) =
    rows.toSeq.toDF("user_id", "value", "__del")

  private def base(rows: (Long, Double)*) =
    rows.toSeq.toDF("user_id", "value")

  test("mergeInto: matched update takes change values, status=updated") {
    val out = Merge.mergeInto(
      base((1L, 10.0)), changes((1L, 20.0, false)), "user_id", "__del")
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("value") == 20.0)
    assert(out(0).getAs[String]("status") == "updated")
  }

  test("mergeInto: unmatched change inserts, status=inserted") {
    val out = Merge.mergeInto(
      base((1L, 10.0)), changes((2L, 5.0, false)), "user_id", "__del")
      .orderBy("user_id").collect()
    assert(out.map(_.getAs[String]("status")).toSeq == Seq("kept", "inserted"))
    assert(out(1).getAs[Double]("value") == 5.0)
  }

  test("mergeInto: matched tombstone deletes the key") {
    val out = Merge.mergeInto(
      base((1L, 10.0), (2L, 11.0)), changes((1L, 0.0, true)),
      "user_id", "__del").collect()
    assert(out.map(_.getAs[Long]("user_id")).toSeq == Seq(2L))
  }

  test("mergeInto: tombstone for an absent key is a no-op") {
    val out = Merge.mergeInto(
      base((1L, 10.0)), changes((9L, 0.0, true)), "user_id", "__del")
      .collect()
    assert(out.map(_.getAs[Long]("user_id")).toSeq == Seq(1L))
    assert(out(0).getAs[String]("status") == "kept")
  }

  test("funnel: a step-2 event BEFORE step 1 does not convert, one after does") {
    val ts = (s: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val df = Seq(
      // u1: click precedes the only view — never converts step 2
      (1L, "click", ts(1)), (1L, "view", ts(2)),
      // u2: view, then click, then purchase — full funnel
      (2L, "view", ts(1)), (2L, "click", ts(2)), (2L, "purchase", ts(3)),
      // u3: purchase between view and click — step 3 needs one AFTER click
      (3L, "view", ts(1)), (3L, "purchase", ts(2)), (3L, "click", ts(3))
    ).toDF("user_id", "event_type", "ts")
    val r = Funnel.conversion(df, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), Seq("s1", "s2", "s3")).collect()(0)
    assert(r.getAs[Long]("n_users") == 3)
    assert(r.getAs[Long]("s1") == 3)     // all three viewed
    assert(r.getAs[Long]("s2") == 2)     // u1's click was too early
    assert(r.getAs[Long]("s3") == 1)     // only u2 purchased after clicking
  }

  test("funnel: input already carrying a t1..tN column is rejected loudly " +
    "(silent withColumn overwrite would corrupt both caller data and step times)") {
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:01")
    val df = Seq((1L, "view", t, 99L), (1L, "click", t, 99L))
      .toDF("user_id", "event_type", "ts", "t1")
    val e = intercept[IllegalArgumentException] {
      Funnel.stepTimes(df, "user_id", "event_type", "ts", Seq("view", "click"))
    }
    assert(e.getMessage.contains("t1"))
    // ...and a non-clashing name on the same frame still works
    val ok = Funnel.stepTimes(df.withColumnRenamed("t1", "prior"),
      "user_id", "event_type", "ts", Seq("view", "click"))
    assert(ok.columns.contains("t1") && ok.columns.contains("t2"))
  }

  test("funnel: ties do not convert (strictly-after semantics)") {
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:01")
    val df = Seq((1L, "view", t), (1L, "click", t))
      .toDF("user_id", "event_type", "ts")
    val r = Funnel.conversion(df, "user_id", "event_type", "ts",
      Seq("view", "click"), Seq("s1", "s2")).collect()(0)
    assert(r.getAs[Long]("s1") == 1)
    assert(r.getAs[Long]("s2") == 0)
  }
}
