package graft

import graft.queries.Breadth101
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the hundred-second wave (Breadth101
  * rolling median / k-core / trimmed mean). */
class Wave104Spec extends SparkSpec {
  import spark.implicits._

  test("rollingMedian: exact low/high middle over the trailing frame") {
    val e = Seq((1L, 0L, "2024-01-01 10:00:00", 1.00),
      (1L, 1L, "2024-01-02 10:00:00", 3.00),
      (1L, 2L, "2024-01-03 10:00:00", 2.00))
      .toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth101.rollingMedian(e, "user_id", "ts", "value",
        "event_id")
      .collect().map(r => (r.getLong(3), r.getDouble(4))).toSeq
    // windows: [1] → 1.0; [1,3] → 2.0; [1,2,3] → 2.0
    assert(got === Seq((1L, 1.0), (2L, 2.0), (3L, 2.0)))
  }

  test("kcore peels the K3 label and keeps the K4 label") {
    // label 1: 4 mutually-linked vectors (K4, degree 3 each — stays in
    // the 3-core); label 2: 3 vectors (K3, degree 2 — peeled).
    val emb = Seq(
      (1L, 1, Array(1.0f, 0.0f, 0.0f)), (2L, 1, Array(0.9f, 0.1f, 0.0f)),
      (3L, 1, Array(0.8f, 0.2f, 0.0f)), (4L, 1, Array(0.7f, 0.3f, 0.0f)),
      (10L, 2, Array(0.0f, 1.0f, 0.0f)), (11L, 2, Array(0.0f, 0.9f, 0.1f)),
      (12L, 2, Array(0.0f, 0.8f, 0.2f)))
      .toDF("vec_id", "label", "embedding")
    val got = Breadth101.kcore(emb, k = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("trimmedMean drops exactly n/10 ranks per side") {
    // 10 values 1.00..10.00: k=1, trim 1.00 and 10.00 → mean 5.50
    val e = (1 to 10).map(i => ("g", i.toDouble))
      .toDF("event_type", "value")
    val r = Breadth101.trimmedMean(e, "event_type", "value").collect()(0)
    assert(r.getLong(1) === 10L && r.getLong(2) === 1L)
    assert(r.getDouble(3) === 5.5)
  }
}
