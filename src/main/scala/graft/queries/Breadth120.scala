package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hundred-twenty-first wave — ordered-sequence analytics over the
  * event stream (the windowFunnel / sequenceMatch family of operators
  * every product-analytics engine ships):
  *
  *  - **q_window_funnel**: per user, the deepest view→click→purchase
  *    prefix completable with STRICTLY increasing timestamps inside a
  *    48 h window anchored at the first step, histogrammed by level.
  *    The engine side is the GREEDY merge — per user, for each view
  *    take the earliest later click, then the earliest later purchase
  *    (binary searches over per-type sorted timestamp arrays, O(n log
  *    n) per user) — which decides the same existence question the
  *    oracle's set-based triple join asks (exchange argument: taking
  *    an earlier intermediate step never hurts a later deadline), at
  *    linear-ish cost instead of the join's per-user quadratic blowup.
  *  - **q_sequence_match**: per user, the ordered event-type sequence
  *    as a single-character string (v/c/p/s/e — the five types'
  *    distinct initials), regex-matched against `s[^e]*p` ("a signup
  *    eventually converts with no error in between"). One groupBy +
  *    one ordered string_agg; the regex class is engine-portable
  *    (ASCII, no backtracking pathologies).
  *
  * Scale shape: both are one shuffle on user_id; per-user state is the
  * user's own event history (the sessionization bound). Timestamps
  * compare at FULL µs precision on both engines (unix_micros /
  * epoch_us) — a seconds cast would collapse same-second ties. */
object Breadth120 {

  /** 48 h funnel window, in µs. */
  private[graft] val FunnelWindowUs = 48L * 3600L * 1000000L

  /** Greedy max-level search: first element of `arr` strictly after
    * `t`, by binary search over the sorted array. */
  private[graft] val funnelLevelUdf =
    udf { (vs: Seq[Long], cs: Seq[Long], ps: Seq[Long]) =>
      def after(arr: Seq[Long], t: Long): Long = {
        var lo = 0; var hi = arr.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (arr(mid) <= t) lo = mid + 1 else hi = mid
        }
        if (lo < arr.length) arr(lo) else Long.MinValue
      }
      var best = if (vs.nonEmpty) 1 else 0
      val it = vs.iterator
      while (best < 3 && it.hasNext) {
        val v = it.next()
        val c = after(cs, v)
        if (c != Long.MinValue && c <= v + FunnelWindowUs) {
          if (best < 2) best = 2
          val p = after(ps, c)
          if (p != Long.MinValue && p <= v + FunnelWindowUs) best = 3
        }
      }
      best
    }

  /** Level histogram of the 48 h view→click→purchase funnel. */
  private[graft] def windowFunnel(df: DataFrame, keyCol: String,
                                  typeCol: String, tsCol: String): DataFrame = {
    // NTZ → LTZ cast is wall-clock identity under the session-wide UTC
    // pin, so unix_micros matches DuckDB's epoch_us on the naive ts
    def tsOf(t: String) = sort_array(collect_list(
      when(col(typeCol) === t, unix_micros(col(tsCol).cast("timestamp")))))
    df.groupBy(col(keyCol))
      .agg(tsOf("view").as("__v"), tsOf("click").as("__c"),
        tsOf("purchase").as("__p"))
      .select(col(keyCol),
        funnelLevelUdf(col("__v"), col("__c"), col("__p")).as("level"))
      .groupBy(col("level")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("level").asc)
  }

  /** Per-user ordered type-initial sequence + the conversion-regex
    * verdict. */
  private[graft] def sequenceMatch(df: DataFrame, keyCol: String,
                                   typeCol: String, tsCol: String,
                                   tieBreak: String,
                                   pattern: String = "s[^e]*p"): DataFrame =
    df.select(col(keyCol),
        struct(col(tsCol), col(tieBreak),
          substring(col(typeCol), 1, 1).as("__i")).as("__s"))
      .groupBy(col(keyCol))
      .agg(array_join(transform(sort_array(collect_list(col("__s"))),
        _.getField("__i")), "").as("__seq"))
      .select(col(keyCol), length(col("__seq")).cast("long").as("seq_len"),
        col("__seq").rlike(pattern).as("matched"))
      .orderBy(col(keyCol).asc)

  val defs: Map[String, Q] = Map(
    "q_window_funnel" -> ((s, dir) =>
      windowFunnel(Tables.events(s, dir), "user_id", "event_type", "ts")),
    "q_sequence_match" -> ((s, dir) =>
      sequenceMatch(Tables.events(s, dir), "user_id", "event_type", "ts",
        "event_id")))

  val oracle: Map[String, String] = Map(
    "q_window_funnel" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
         |u AS (SELECT DISTINCT user_id FROM e),
         |l1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
         |l2 AS (
         |  SELECT DISTINCT v.user_id
         |  FROM e v JOIN e c ON c.user_id = v.user_id
         |  WHERE v.event_type = 'view' AND c.event_type = 'click'
         |    AND c.t > v.t AND c.t <= v.t + $FunnelWindowUs),
         |l3 AS (
         |  SELECT DISTINCT v.user_id
         |  FROM e v
         |  JOIN e c ON c.user_id = v.user_id
         |  JOIN e p ON p.user_id = v.user_id
         |  WHERE v.event_type = 'view' AND c.event_type = 'click'
         |    AND p.event_type = 'purchase'
         |    AND c.t > v.t AND c.t <= v.t + $FunnelWindowUs
         |    AND p.t > c.t AND p.t <= v.t + $FunnelWindowUs),
         |lv AS (
         |  SELECT u.user_id,
         |    CASE WHEN l3.user_id IS NOT NULL THEN 3
         |         WHEN l2.user_id IS NOT NULL THEN 2
         |         WHEN l1.user_id IS NOT NULL THEN 1
         |         ELSE 0 END AS level
         |  FROM u
         |  LEFT JOIN l1 ON l1.user_id = u.user_id
         |  LEFT JOIN l2 ON l2.user_id = u.user_id
         |  LEFT JOIN l3 ON l3.user_id = u.user_id)
         |SELECT level, CAST(count(*) AS BIGINT) AS n_users
         |FROM lv GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_sequence_match" ->
      """WITH s AS (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), ''
        |      ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY 1)
        |SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
        |  regexp_matches(seq, 's[^e]*p') AS matched
        |FROM s ORDER BY user_id""".stripMargin)
}
