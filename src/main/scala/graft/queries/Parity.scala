package graft.queries

import graft.Tables
import graft.ops.{History, Latest, TopK}
import org.apache.spark.sql.functions._

/** Reference-parity queries: every operator of SURVEY.md §2 instantiated
  * over the testdata tables (FIXTURES.md role mapping: events ≈ prices).
  * Each query has an ANSI-SQL twin in `oracle` for the DuckDB differential
  * check; all outputs carry a total ORDER BY for hash-stable comparison.
  */
object Parity {

  val defs: Map[String, Q] = Map(
    // J1+A1+O1 — the reference's flagship: latest row per key (join form,
    // max-ts ties all emitted), ordered by value desc (api/server.js:67-77).
    "q_latest" -> ((s, dir) => {
      Latest.latestPerKeyJoin(Tables.events(s, dir), "user_id", "ts")
        .select("event_id", "user_id", "ts", "event_type", "value")
        .orderBy(col("value").desc_nulls_last, col("user_id").asc, col("event_id").asc)
    }),

    // W1 — window form: exactly one row per key (frontend's Map-dedup
    // semantics, frontend/src/App.js:182-186).
    "q_latest_window" -> ((s, dir) => {
      Latest.latestPerKeyWindow(Tables.events(s, dir), Seq("user_id"),
          col("ts").desc, col("event_id").desc)
        .select("event_id", "user_id", "ts", "event_type", "value")
        .orderBy(col("user_id").asc)
    }),

    // P6+P7+P8+O2 — per-key history with inclusive-end-day rewrite
    // (api/server.js:90-143).
    "q_history" -> ((s, dir) => {
      History.keyHistory(Tables.events(s, dir), "user_id", 7L, "ts",
          "2024-01-05", "2024-01-20", "event_id")
        .select("event_id", "ts", "event_type", "value")
    }),

    // P6–P8 variants — the reference's dynamic WHERE compiler emits FOUR
    // shapes (api/server.js:106-124); q_history pins both-bounds, these
    // pin the other three. q_history_default is what every dashboard load
    // hits: the client's default 30-day window ending at an as-of day
    // (frontend/src/App.js:76-82).
    "q_history_default" -> ((s, dir) => {
      val (start, end) = History.defaultWindow("2024-01-25", 30)
      History.keyHistory(Tables.events(s, dir), "user_id", 7L, "ts",
          start, end, "event_id")
        .select("event_id", "ts", "event_type", "value")
    }),

    // end-only: open start, inclusive end day.
    "q_history_open_start" -> ((s, dir) => {
      History.keyHistoryOptional(Tables.events(s, dir), "user_id", 7L, "ts",
          None, Some("2024-01-10"), "event_id")
        .select("event_id", "ts", "event_type", "value")
    }),

    // start-only: closed start, open end.
    "q_history_open_end" -> ((s, dir) => {
      History.keyHistoryOptional(Tables.events(s, dir), "user_id", 7L, "ts",
          Some("2024-01-15"), None, "event_id")
        .select("event_id", "ts", "event_type", "value")
    }),

    // no dates: the key's full history, time-ordered.
    "q_history_nodates" -> ((s, dir) => {
      History.keyHistoryOptional(Tables.events(s, dir), "user_id", 7L, "ts",
          None, None, "event_id")
        .select("event_id", "ts", "event_type", "value")
    }),

    // P1–P5 — ingest shaping: project, validate, normalize key case, cast,
    // stamp batch-constant timestamp (etl/crypto_etl.py:70-127).
    "q_ingest_shape" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"), lower(col("event_type")).as("event_type_norm"),
          col("value").cast("double").as("value"))
        .filter(col("event_type_norm").isNotNull && col("value").isNotNull)
        .withColumn("batch_ts", to_timestamp_ntz(lit("2024-02-01 00:00:00")))
        .orderBy(col("event_id").asc)
    }),

    // A2+O3+O4+P9 — top-7 + "Other" rollup + percent-of-total (doughnut
    // prep, frontend/src/App.js:87-142). Per-key revenue is rounded BEFORE
    // ranking so the cut is reproducible across engines.
    "q_topk_other" -> ((s, dir) => {
      val rev = Tables.orders(s, dir)
        .filter(col("o_totalprice").isNotNull && col("o_totalprice") > 0)
        .groupBy(col("o_custkey"))
        .agg(round(sum("o_totalprice"), 2).as("rev"))
        .select(col("o_custkey").cast("string").as("bucket"), col("rev"))
      val rolled = TopK.topKPlusOther(rev, "bucket", "rev", 7)
        .withColumn("rev", round(col("rev"), 2))
      TopK.withPercentOfTotal(rolled, "rev")
        .orderBy(col("rev").desc_nulls_last, col("bucket").asc)
    }),

    // A3+W2 — percent-of-total by market segment.
    "q_pct_total" -> ((s, dir) => {
      val seg = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(round(sum("o_totalprice"), 2).as("rev"))
      TopK.withPercentOfTotal(seg, "rev")
        .orderBy(col("rev").desc_nulls_last, col("c_mktsegment").asc)
    }),

    // D2+O5 — distinct keys, sorted (dropdown feed,
    // frontend/src/App.js:569-571).
    "q_distinct_keys" -> ((s, dir) => {
      Tables.events(s, dir).select("event_type").distinct()
        .orderBy(col("event_type").asc)
    }),

    // D1 — dedup-by-key last-wins (ws payload Map semantics,
    // frontend/src/App.js:182-186), pinned deterministic.
    "q_dedup_lastwins" -> ((s, dir) => {
      Latest.latestPerKeyWindow(Tables.events(s, dir),
          Seq("user_id", "event_type"), col("ts").desc, col("event_id").desc)
        .select("user_id", "event_type", "event_id", "ts", "value")
        .orderBy(col("user_id").asc, col("event_type").asc)
    }),

    // F1–F8 — scalar function bundle: case, date format/arith, round,
    // concat (SURVEY.md §2.8).
    "q_scalar_funcs" -> ((s, dir) => {
      Tables.orders(s, dir).select(
          col("o_orderkey"),
          upper(col("o_orderstatus")).as("status_u"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od_str"),
          date_add(col("o_orderdate").cast("date"), 1).as("od_next"),
          date_sub(col("o_orderdate").cast("date"), 30).as("od_prev30"),
          year(col("o_orderdate")).as("od_year"),
          month(col("o_orderdate")).as("od_month"),
          // no round: identical IEEE division on both engines is bit-exact,
          // while round() at a decimal boundary (2-dp data / 1000) is not.
          (col("o_totalprice") / 1000.0).as("price_k"),
          // F7 thousands formatting. Pre-round half-away-from-zero:
          // format_number itself rounds HALF_EVEN, which diverges from the
          // oracle's round() exactly on the representable .5 boundaries.
          format_number(round(col("o_totalprice"), 0), 0).as("price_fmt"),
          concat(lit("o_"), col("o_orderkey")).as("okey_str"))
        .orderBy(col("o_orderkey").asc)
    }),

    // F9 — JSON decode of the semi-structured props column + agg.
    "q_json_extract" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
          col("value"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy(col("k").asc)
    }),

    // The same single-key JSON aggregation through Spark 4's VARIANT
    // path: `parse_json` once into the binary variant encoding, then a
    // typed `variant_get` probe. At 100 TB this is the semi-structured
    // plan that wins as soon as a query touches MORE than one path —
    // the string parses once and every extraction is a binary-offset
    // probe, where stacked `get_json_object` calls re-parse the string
    // per path. Kept alongside q_json_extract with the IDENTICAL
    // oracle: the two engine paths must agree value-for-value, so a
    // user can migrate `get_json_object` → variant without a semantic
    // audit (this pair IS that audit, re-run per round).
    "q_variant_extract" -> ((s, dir) => {
      Tables.events(s, dir)
        .selectExpr("CAST(variant_get(parse_json(props), '$.k') AS INT) AS k",
          "value")
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy(col("k").asc)
    }),

    // Event-time tumbling window (batch twin of the streaming agg;
    // SURVEY.md §2.9): 1-day windows × event_type.
    "q_time_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("window_start").asc, col("event_type").asc)
    }))

  val oracle: Map[String, String] = Map(
    "q_latest" ->
      """SELECT t1.event_id, t1.user_id, t1.ts, t1.event_type, t1.value
        |FROM events t1
        |JOIN (SELECT user_id, max(ts) AS max_ts FROM events GROUP BY user_id) t2
        |  ON t1.user_id = t2.user_id AND t1.ts = t2.max_ts
        |ORDER BY t1.value DESC NULLS LAST, t1.user_id, t1.event_id""".stripMargin,

    "q_latest_window" ->
      """SELECT event_id, user_id, ts, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_history" ->
      """SELECT event_id, ts, event_type, value FROM events
        |WHERE user_id = 7
        |  AND ts >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-21 00:00:00'
        |ORDER BY ts, event_id""".stripMargin,

    "q_history_default" ->
      """SELECT event_id, ts, event_type, value FROM events
        |WHERE user_id = 7
        |  AND ts >= TIMESTAMP '2023-12-26 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-26 00:00:00'
        |ORDER BY ts, event_id""".stripMargin,

    "q_history_open_start" ->
      """SELECT event_id, ts, event_type, value FROM events
        |WHERE user_id = 7
        |  AND ts < TIMESTAMP '2024-01-11 00:00:00'
        |ORDER BY ts, event_id""".stripMargin,

    "q_history_open_end" ->
      """SELECT event_id, ts, event_type, value FROM events
        |WHERE user_id = 7
        |  AND ts >= TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY ts, event_id""".stripMargin,

    "q_history_nodates" ->
      """SELECT event_id, ts, event_type, value FROM events
        |WHERE user_id = 7
        |ORDER BY ts, event_id""".stripMargin,

    "q_ingest_shape" ->
      """SELECT event_id, lower(event_type) AS event_type_norm,
        |  CAST(value AS DOUBLE) AS value,
        |  TIMESTAMP '2024-02-01 00:00:00' AS batch_ts
        |FROM events
        |WHERE lower(event_type) IS NOT NULL AND value IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "q_topk_other" ->
      """WITH rev AS (
        |  SELECT CAST(o_custkey AS VARCHAR) AS bucket,
        |         round(sum(o_totalprice), 2) AS rev
        |  FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
        |  GROUP BY o_custkey),
        |ranked AS (
        |  SELECT *, row_number() OVER (ORDER BY rev DESC, bucket) AS rn FROM rev),
        |agg AS (
        |  SELECT CASE WHEN rn <= 7 THEN bucket ELSE 'Other' END AS bucket,
        |         round(sum(rev), 2) AS rev
        |  FROM ranked GROUP BY 1)
        |SELECT bucket, rev,
        |  round(100 * rev / (SELECT sum(rev) FROM agg), 2) AS pct
        |FROM agg ORDER BY rev DESC NULLS LAST, bucket""".stripMargin,

    "q_pct_total" ->
      """WITH seg AS (
        |  SELECT c_mktsegment, round(sum(o_totalprice), 2) AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment)
        |SELECT c_mktsegment, rev,
        |  round(100 * rev / (SELECT sum(rev) FROM seg), 2) AS pct
        |FROM seg ORDER BY rev DESC NULLS LAST, c_mktsegment""".stripMargin,

    "q_distinct_keys" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",

    "q_dedup_lastwins" ->
      """SELECT user_id, event_type, event_id, ts, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q_scalar_funcs" ->
      """SELECT o_orderkey,
        |  upper(o_orderstatus) AS status_u,
        |  strftime(o_orderdate, '%Y-%m-%d') AS od_str,
        |  CAST(o_orderdate AS DATE) + 1 AS od_next,
        |  CAST(o_orderdate AS DATE) - 30 AS od_prev30,
        |  CAST(year(o_orderdate) AS INTEGER) AS od_year,
        |  CAST(month(o_orderdate) AS INTEGER) AS od_month,
        |  o_totalprice / 1000.0 AS price_k,
        |  format('{:,}', CAST(round(o_totalprice, 0) AS BIGINT)) AS price_fmt,
        |  'o_' || o_orderkey AS okey_str
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,

    // deliberately byte-identical to q_json_extract's oracle: the
    // variant path must reproduce the string-path results exactly
    "q_variant_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,

    "q_time_window" ->
      """SELECT date_trunc('day', ts) AS window_start, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)
}
