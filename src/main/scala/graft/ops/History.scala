package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's history endpoint: per-key time-range scan with
  * hand-rolled inclusive-end-day semantics (`api/server.js:90-143` —
  * `timestamp >= start 00:00` AND `timestamp < endDate + 1 day`,
  * `api/server.js:113-124`).
  *
  * Both bounds fold to literals, so Catalyst pushes them into the parquet
  * scan (`PushedFilters`) — at 100 TB with date-partitioned storage this is
  * partition pruning, the difference between scanning a day and a decade.
  */
object History {

  /** ts in [startDay 00:00, endDay + 1 day) — endDay inclusive. NTZ bounds
    * (the engine's canonical timestamp flavor — graft.Tables). */
  def inclusiveDayRange(tsCol: Column, startDay: String, endDay: String): Column =
    tsCol >= to_timestamp_ntz(lit(startDay)) &&
      tsCol < date_add(to_date(lit(endDay)), 1).cast("timestamp_ntz")

  /** Equality key + inclusive day range + stable time ordering
    * (`api/server.js:97-126`). */
  def keyHistory(df: DataFrame, keyCol: String, keyValue: Any, tsCol: String,
                 startDay: String, endDay: String, tieBreak: String): DataFrame =
    keyHistoryOptional(df, keyCol, keyValue, tsCol, Some(startDay), Some(endDay), tieBreak)

  /** The reference's dynamic WHERE compiler builds FOUR shapes — no
    * dates, start-only, end-only, both (`api/server.js:106-124`); this is
    * all four behind optional bounds. Each present bound folds to a
    * literal comparison Catalyst pushes into the scan, so the open-ended
    * shapes prune exactly as hard as their one present bound allows. */
  def keyHistoryOptional(df: DataFrame, keyCol: String, keyValue: Any,
                         tsCol: String, startDay: Option[String],
                         endDay: Option[String], tieBreak: String): DataFrame = {
    val lower = startDay.map(d => col(tsCol) >= to_timestamp_ntz(lit(d)))
    val upper = endDay.map(d =>
      col(tsCol) < date_add(to_date(lit(d)), 1).cast("timestamp_ntz"))
    val pred = (lower.toSeq ++ upper.toSeq)
      .foldLeft(col(keyCol) === lit(keyValue))(_ && _)
    df.filter(pred).orderBy(col(tsCol).asc, col(tieBreak).asc)
  }

  /** The client's default range: the `days`-day window ending at
    * `asOfDay`, both ends inclusive (`frontend/src/App.js:76-82` — today
    * minus 30 days through today). Deterministic: as-of is a parameter,
    * never wall clock. */
  def defaultWindow(asOfDay: String, days: Int = 30): (String, String) = {
    val end = java.time.LocalDate.parse(asOfDay)
    (end.minusDays(days.toLong).toString, end.toString)
  }
}
