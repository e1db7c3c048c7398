package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-twenty-fifth wave — the BITEMPORAL point query: "as of
  * transaction time T, what did we believe the value was for valid
  * time ≤ D". Every event is a version: its VALID time is the trading
  * day it describes (date(ts)); its TRANSACTION time is when the
  * warehouse learned it — event time plus the per-event ingest lag
  * carried in props.k seconds, so high-lag events are genuinely
  * LATE-ARRIVING facts (old valid day, late tx) and the two axes are
  * independent. Per (T, D, key) the answer is the version with max
  * (valid day, tx, event_id) among those with valid ≤ D and tx ≤ T; a
  * 3×3 probe grid (quarter points of the observed tx / valid ranges,
  * exact integer µs / day arithmetic) exercises both axes: moving T
  * back rewinds what was KNOWN, moving D back rewinds what was ASKED.
  *
  * SCD2 (q_scd2) and snapshot time travel (q_time_travel) each cover
  * one axis; this is the joint reconstruction query behind audited
  * warehouses ("what did Friday's report say the Tuesday close was?").
  *
  * Scale shape: the probe grid is a 9-row broadcast; the event scan
  * fans out ×9 with map-side filtering and one (probe, key) window —
  * at warehouse scale the tx/valid predicates push into the
  * date-partitioned scan (the q_history pruning pin). */
object Breadth124 {

  private val GridN = 3

  /** Bitemporal value-as-of over the 3×3 quarter-point probe grid. */
  private[graft] def bitemporal(df: DataFrame, keyCol: String,
                                tsCol: String, valCol: String,
                                tieBreak: String,
                                lagJsonField: String = "k"): DataFrame = {
    val e = df.select(col(keyCol),
        (unix_micros(col(tsCol).cast("timestamp")) +
          get_json_object(col("props"), s"$$.$lagJsonField").cast("long")
            * lit(1000000L)).as("__tx"),
        unix_date(col(tsCol).cast("date")).as("__vd"),
        col(valCol), col(tieBreak))
      .filter(col("__tx").isNotNull)
    val rng = e.agg(min(col("__tx")).as("__t0"), max(col("__tx")).as("__t1"),
      min(col("__vd")).as("__d0"), max(col("__vd")).as("__d1"))
    val spark = df.sparkSession
    import spark.implicits._
    val probes = (for (j <- 1 to GridN; k <- 1 to GridN)
      yield (j.toLong, k.toLong)).toDF("probe_tx", "probe_valid")
      .crossJoin(broadcast(rng))
      .select(col("probe_tx"), col("probe_valid"),
        (col("__t0") + expr("probe_tx * (__t1 - __t0) div 4")).as("__tcut"),
        (col("__d0") + expr("probe_valid * (__d1 - __d0) div 4"))
          .as("__dcut"))
    val w = Window.partitionBy(col("probe_tx"), col("probe_valid"),
        col(keyCol))
      .orderBy(col("__vd").desc, col("__tx").desc, col(tieBreak).desc)
    e.crossJoin(broadcast(probes))
      .filter(col("__tx") <= col("__tcut") && col("__vd") <= col("__dcut"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("probe_tx"), col("probe_valid"), col(keyCol),
        date_from_unix_date(col("__vd").cast("int")).as("valid_day"),
        col(tieBreak), col(valCol))
      .orderBy(col("probe_tx").asc, col("probe_valid").asc,
        col(keyCol).asc)
  }

  val defs: Map[String, Q] = Map(
    "q_bitemporal" -> ((s, dir) =>
      bitemporal(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")))

  val oracle: Map[String, String] = Map(
    "q_bitemporal" ->
      s"""WITH e AS (
         |  SELECT user_id,
         |    epoch_us(ts)
         |      + TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT)
         |        * 1000000 AS tx,
         |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS vd,
         |    value, event_id
         |  FROM events
         |  WHERE TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT)
         |    IS NOT NULL),
         |rng AS (
         |  SELECT min(tx) AS t0, max(tx) AS t1,
         |    min(vd) AS d0, max(vd) AS d1
         |  FROM e),
         |probes AS (
         |  SELECT CAST(j.j AS BIGINT) AS probe_tx,
         |    CAST(k.k AS BIGINT) AS probe_valid,
         |    t0 + (j.j * (t1 - t0)) // 4 AS tcut,
         |    d0 + (k.k * (d1 - d0)) // 4 AS dcut
         |  FROM (SELECT unnest(generate_series(1, 3)) AS j) j,
         |       (SELECT unnest(generate_series(1, 3)) AS k) k, rng),
         |ranked AS (
         |  SELECT p.probe_tx, p.probe_valid, e.user_id, e.vd, e.value,
         |    e.event_id,
         |    row_number() OVER (
         |      PARTITION BY p.probe_tx, p.probe_valid, e.user_id
         |      ORDER BY e.vd DESC, e.tx DESC, e.event_id DESC) AS rn
         |  FROM e JOIN probes p
         |    ON e.tx <= p.tcut AND e.vd <= p.dcut)
         |SELECT probe_tx, probe_valid, user_id,
         |  DATE '1970-01-01' + CAST(vd AS INTEGER) AS valid_day,
         |  event_id, value
         |FROM ranked WHERE rn = 1
         |ORDER BY probe_tx, probe_valid, user_id""".stripMargin)
}
