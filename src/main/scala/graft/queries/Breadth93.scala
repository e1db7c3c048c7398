package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ninety-fourth wave — sequence analytics at the journey grain (the
  * step-indexed complement of q_transitions' global pair matrix).
  *
  *  - **q_user_paths**: the top opening journeys — each user's first
  *    three event types (fully (ts, id)-ordered) joined into a path
  *    string, counted, top 20 by (count, path). Shorter histories
  *    form shorter paths; they count too.
  *  - **q_step_transitions**: the step-INDEXED transition counts —
  *    (step s, type at s, type at s+1) for s = 1..4 over each user's
  *    opening five events. Where q_transitions pools all adjacent
  *    pairs, this keeps the journey position, the Sankey-diagram
  *    input shape.
  *  - **q_time_to_convert**: signup→purchase latency — per user, the
  *    first purchase STRICTLY after the first signup (tie-exact (ts,
  *    id) comparison), integer µs deltas, rank-exact median and p90
  *    seconds over converted users. No float quantile.
  *
  * Scale shape: paths/steps prune each user to ≤5 rows with one
  * WindowGroupLimit-eligible rank before any aggregation; conversion
  * joins are per-key aggregates both sides. */
object Breadth93 {

  private[graft] val PathTopN = 20

  /** Top-N first-3-event-type paths. */
  private[graft] def userPaths(df: DataFrame, keyCol: String, tsCol: String,
                               tieBreak: String, typeCol: String,
                               topN: Int = PathTopN): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    val first3 = df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 3)
    first3.groupBy(col(keyCol))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("__rn"), col(typeCol)))),
        x => x.getField(typeCol)), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc)
      .limit(topN)
  }

  /** Step-indexed transition counts over the opening five events. */
  private[graft] def stepTransitions(df: DataFrame, keyCol: String,
                                     tsCol: String, tieBreak: String,
                                     typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 5)
      .withColumn("__next", lead(col(typeCol), 1)
        .over(Window.partitionBy(col(keyCol)).orderBy(col("__rn").asc)))
      .filter(col("__next").isNotNull)
      .groupBy(col("__rn").cast("long").as("step"),
        col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("step").asc, col("from_type").asc, col("to_type").asc)
  }

  /** Rank-exact median/p90 of first-signup→first-purchase latency. */
  private[graft] def timeToConvert(df: DataFrame, keyCol: String,
                                   tsCol: String, tieBreak: String,
                                   typeCol: String, fromType: String,
                                   toType: String): DataFrame = {
    val wf = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__id").asc)
    val firstFrom = df.filter(col(typeCol) === fromType)
      .select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        col(tieBreak).as("__id"))
      .withColumn("__rn", row_number().over(wf))
      .filter(col("__rn") === 1)
      .select(col("__k"), col("__ts").as("__fts"), col("__id").as("__fid"))
    val conv = df.filter(col(typeCol) === toType)
      .select(col(keyCol).as("__k"), col(tsCol).as("__pts"),
        col(tieBreak).as("__pid"))
      .join(firstFrom, Seq("__k"))
      .filter(col("__pts") > col("__fts") ||
        (col("__pts") === col("__fts") && col("__pid") > col("__fid")))
      .groupBy(col("__k"))
      .agg(min(struct(col("__pts"), col("__pid"))).as("__p"),
        max(col("__fts")).as("__f"))
      .select(col("__k"),
        (unix_micros(col("__p.__pts").cast("timestamp")) -
          unix_micros(col("__f").cast("timestamp"))).as("__dus"))
    val ord = Window.orderBy(col("__dus").asc, col("__k").asc)
    conv.withColumn("__rn", row_number().over(ord))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
      .agg(max(col("__n")).as("n_converted"),
        max(when(col("__rn") === expr("(__n + 1) div 2"),
          expr("__dus div 1000000"))).as("median_secs"),
        max(when(col("__rn") === expr("(9 * __n + 9) div 10"),
          expr("__dus div 1000000"))).as("p90_secs"))
  }

  val defs: Map[String, Q] = Map(
    "q_user_paths" -> ((s, dir) =>
      userPaths(Tables.events(s, dir), "user_id", "ts", "event_id",
        "event_type")),
    "q_step_transitions" -> ((s, dir) =>
      stepTransitions(Tables.events(s, dir), "user_id", "ts", "event_id",
        "event_type")),
    "q_time_to_convert" -> ((s, dir) =>
      timeToConvert(Tables.events(s, dir), "user_id", "ts", "event_id",
        "event_type", "signup", "purchase")))

  val oracle: Map[String, String] = Map(
    "q_user_paths" ->
      s"""WITH r AS (
         |  SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn
         |  FROM events),
         |p AS (
         |  SELECT user_id,
         |    string_agg(event_type, '>' ORDER BY rn) AS path
         |  FROM r WHERE rn <= 3 GROUP BY 1)
         |SELECT path, CAST(count(*) AS BIGINT) AS n_users
         |FROM p GROUP BY 1
         |ORDER BY n_users DESC, path
         |LIMIT $PathTopN""".stripMargin,

    "q_step_transitions" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |s AS (
        |  SELECT user_id, rn, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY rn)
        |      AS next_type
        |  FROM r WHERE rn <= 5)
        |SELECT CAST(rn AS BIGINT) AS step, event_type AS from_type,
        |  next_type AS to_type, CAST(count(*) AS BIGINT) AS n_users
        |FROM s WHERE next_type IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_time_to_convert" ->
      """WITH f AS (
        |  SELECT user_id, ts AS fts, event_id AS fid FROM (
        |    SELECT user_id, ts, event_id,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS rn
        |    FROM events WHERE event_type = 'signup')
        |  WHERE rn = 1),
        |c AS (
        |  SELECT e.user_id,
        |    CAST(epoch_us(min(struct_pack(ts := e.ts, id := e.event_id)).ts)
        |      - epoch_us(max(f.fts)) AS BIGINT) AS dus
        |  FROM events e JOIN f ON e.user_id = f.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND (e.ts > f.fts OR (e.ts = f.fts AND e.event_id > f.fid))
        |  GROUP BY 1),
        |r AS (
        |  SELECT user_id, dus,
        |    row_number() OVER (ORDER BY dus, user_id) AS rn,
        |    count(*) OVER () AS n
        |  FROM c)
        |SELECT CAST(max(n) AS BIGINT) AS n_converted,
        |  CAST(max(CASE WHEN rn = (n + 1) // 2
        |    THEN dus // 1000000 END) AS BIGINT) AS median_secs,
        |  CAST(max(CASE WHEN rn = (9 * n + 9) // 10
        |    THEN dus // 1000000 END) AS BIGINT) AS p90_secs
        |FROM r""".stripMargin)
}
