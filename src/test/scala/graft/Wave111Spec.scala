package graft

import graft.queries.Breadth106
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the hundred-seventh wave (Breadth106
  * VWMA / envelope / disparity). */
class Wave111Spec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String, Double, String)]) =
    rows.toDF("user_id", "event_id", "at", "value", "props")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("vwma: volume-weighted over the trailing frame, one division") {
    // closes 1.00 (vol 1), 2.00 (vol 3) → vwma2 = (100+600)/4 = 1.75
    val e = ev(Seq(
      (1L, 0L, "2024-01-01 10:00:00", 1.0, """{"k":1}"""),
      (1L, 1L, "2024-01-02 10:00:00", 2.0, """{"k":3}""")))
    val got = Breadth106.vwma(e, "user_id", "ts", "value", "event_id", "k")
      .collect().map(r => (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSeq
    assert(got === Seq(Some(1.0), Some(1.75)))
  }

  test("envelope: integer-exact band flags and divided band edges") {
    // closes 1.00, 1.00, 1.10: at bar 3, sma = 310/3; upper edge uses
    // s·1025/(m·1000): 110·3·1000 = 330000 > 310·1025 = 317750 → above
    val e = ev(Seq(
      (1L, 0L, "2024-01-01 10:00:00", 1.0, "{}"),
      (1L, 1L, "2024-01-02 10:00:00", 1.0, "{}"),
      (1L, 2L, "2024-01-03 10:00:00", 1.1, "{}")))
    val got = Breadth106.envelope(e, "user_id", "ts", "value", "event_id")
      .collect()
    val r = got(2)
    assert(r.getDouble(3) === 310.0 / 3.0 / 100.0)
    assert(r.getDouble(4) === 310.0 * 1025.0 / 3000.0 / 100.0)
    assert(r.getBoolean(6) === true && r.getBoolean(7) === false)
    assert(got(0).getBoolean(6) === false)
  }

  test("disparity: 100·close·m/Σc") {
    val e = ev(Seq(
      (1L, 0L, "2024-01-01 10:00:00", 1.0, "{}"),
      (1L, 1L, "2024-01-02 10:00:00", 3.0, "{}")))
    val got = Breadth106.disparity(e, "user_id", "ts", "value", "event_id")
      .collect().map(_.getDouble(3)).toSeq
    // bar 2: 100·300·2/400 = 150
    assert(got === Seq(100.0, 150.0))
  }
}
