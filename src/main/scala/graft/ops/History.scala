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
    df.filter(col(keyCol) === lit(keyValue) &&
        inclusiveDayRange(col(tsCol), startDay, endDay))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
}
