package graft

import graft.queries.Breadth44
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the forty-fifth wave (Breadth44 count-min
  * sketch). */
class Wave44Spec extends SparkSpec {
  import spark.implicits._

  test("countMin: few distinct keys in a wide sketch estimate exactly — " +
    "no undercount is structural, no overcount needs d-row independence") {
    val df = (Seq.fill(5)(3L) ++ Seq.fill(3)(9L) ++ Seq(40L))
      .toDF("user_id")
    val got = Breadth44.countMin(df, "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq((3L, 5L, 5L, 0L), (9L, 3L, 3L, 0L),
      (40L, 1L, 1L, 0L)))
  }

  test("cmsCells: the sketch is linear — every row's cells sum to the " +
    "total arrival count") {
    val df = (0L until 100L).flatMap(k => Seq.fill((k % 3 + 1).toInt)(k))
      .toDF("user_id")
    val total = df.count()
    val rowSums = Breadth44.cmsCells(
        Breadth44.keyCounts(df, "user_id"), 16)
      .groupBy("row").agg(sum("cell").as("mass"))
      .collect().map(r => r.getLong(1)).toSeq
    assert(rowSums.size === 4)
    assert(rowSums.forall(_ === total))
  }

  test("widthCurve: estimates never undercount and total overestimate " +
    "is non-increasing in width") {
    val df = (0L until 200L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
      .toDF("user_id")
    val curve = Breadth44.widthCurve(df, "user_id")
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(4))).toSeq
    assert(curve.map(_._1) === Seq(16, 64, 256))
    assert(curve.forall(_._2 >= 0L), "CMS must never undercount")
    assert(curve.map(_._2) === curve.map(_._2).sorted.reverse,
      s"total overestimate should shrink as width grows: $curve")
  }
}
