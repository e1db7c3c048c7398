package graft

import graft.queries.Breadth67
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the sixty-eighth wave (Breadth67 info
  * ratio / correlogram / weighted sampling). */
class Wave69Spec extends SparkSpec {
  import spark.implicits._

  private def eventsOf(rows: Seq[(Long, Long, String, Double)]) =
    rows.toDF("user_id", "event_id", "at", "value")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")

  test("infoRatio: hand 3-key panel against the daily median move") {
    // day-moves: A +10,+10; B 0,-20... closes chosen so day medians
    // are 0 then 10 → excess: A (10,0) → IR 1; B (0,-20) → -1;
    // C (-10,10) → 0.
    val rows = Seq(
      (1L, "2024-01-01", 1.00), (1L, "2024-01-02", 1.10),
      (1L, "2024-01-03", 1.20),
      (2L, "2024-01-01", 1.00), (2L, "2024-01-02", 1.00),
      (2L, "2024-01-03", 0.90),
      (3L, "2024-01-01", 1.00), (3L, "2024-01-02", 0.90),
      (3L, "2024-01-03", 1.10))
    val events = eventsOf(rows.zipWithIndex.map { case ((u, d, v), i) =>
      (u, i.toLong, s"$d 10:00:00", v)
    })
    val got = Breadth67.infoRatio(events, "user_id", "ts", "value",
        "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got === Seq((1L, 2L, 1.0), (2L, 2L, -1.0), (3L, 2L, 0.0)))
  }

  test("acf: an alternating series is anticorrelated at lag 1, " +
    "correlated at lag 2, unscored at a single-pair lag") {
    val closes = Seq(1.00, 1.01, 1.00, 1.01, 1.00)
    val events = eventsOf(closes.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong, f"2024-01-${i + 1}%02d 10:00:00", v)
    })
    val got = Breadth67.acf(events, "user_id", "ts", "value", "event_id")
      .collect().map(r => (r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got.map(t => (t._1, t._2)) === Seq((1, 3L), (2, 2L), (3, 1L)))
    assert(math.abs(got(0)._3.get - (-1.0)) < 1e-12)
    assert(got(1)._3.get === 1.0)
    assert(got(2)._3 === None)
  }

  test("weightedSample: matches an independent Scala re-derivation of " +
    "the ES keys, and zero-weight rows never sample") {
    val rows = Seq((10L, 100L), (11L, 5L), (12L, 900L), (13L, 40L),
      (14L, 250L), (15L, 0L))
    val docs = rows.map { case (id, w) => ("s1", id, w) }
      .toDF("source", "doc_id", "n_chars")
    val got = Breadth67.weightedSample(docs, "source", "doc_id",
        "n_chars", 3)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    // independent ES key: u from the first 15 md5 hex digits of
    // "id#ws", key = ln(u)/w, top-3 by key desc.
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): Double = {
      val hex = md.digest(s"$id#${Breadth67.WsSeed}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val u = (h.toDouble + 0.5) / Breadth67.TwoPow60.toDouble
      math.log(u) / w.toDouble
    }
    val expected = rows.filter(_._2 > 0)
      .sortBy { case (id, w) => (-key(id, w), id) }.take(3)
      .zipWithIndex.map { case ((id, _), i) => (i + 1, id) }
    assert(got === expected)
  }
}
