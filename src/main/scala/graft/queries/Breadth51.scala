package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifty-second wave — SAX symbolization of price series.
  *
  * Symbolic Aggregate approXimation (Lin et al.) turns a numeric
  * series into a short word so that sequence tooling (dedup, motif
  * counting, grep-able pattern screens) applies to time series. Two
  * stages, two queries:
  *
  *  - **q_sax**: PAA — each key's day-close series in segments of
  *    4 bars, segment value = mean close (one BIGINT-sum / count
  *    division) — then a symbol per segment from RANK-quartile
  *    breakpoints: bucket = ((rank−1)·4) div n_segs over the key's own
  *    segments. The classic SAX breakpoints are Gaussian quantiles of
  *    a z-normalized series — float-heavy and engine-divergent; the
  *    rank form is the same equi-depth intent with ZERO float
  *    arithmetic (the Theil–Sen low-median stance).
  *  - **q_sax_words**: the per-key SAX word (symbols in time order)
  *    plus how many OTHER keys share the exact word — coarse-shape
  *    clustering as a string groupBy, the payoff of symbolization:
  *    motif detection over 10⁶ keys is a |words|-sized aggregate, not
  *    a pairwise series comparison.
  *
  * Scale shape: everything is per-key window + groupBy over the
  * memoized bar grid (calendar-bounded series); the word join is a
  * |keys|-row aggregate joined back on the word string. */
object Breadth51 {

  private[graft] val SaxSeg = 4 // bars per PAA segment
  private[graft] val SaxAlpha = 4 // alphabet size (a-d)

  /** Per-(key, segment) PAA mean + rank-quartile symbol. */
  private[graft] def saxSegments(df: DataFrame, keyCol: String,
                                 tsCol: String, valCol: String,
                                 tieBreak: String): DataFrame = {
    val byDay = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val segs = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .select(col(keyCol), col("day"), col("close"))
      .withColumn("__i", row_number().over(byDay).cast("long"))
      .withColumn("seg_idx", expr(s"(__i - 1) div $SaxSeg"))
      .groupBy(col(keyCol), col("seg_idx"))
      .agg(count(lit(1)).as("n_bars"), sum(col("close")).as("__cs"))
      .withColumn("seg_mean",
        col("__cs").cast("double") / col("n_bars").cast("double"))
    val byMean = Window.partitionBy(col(keyCol))
      .orderBy(col("seg_mean").asc, col("seg_idx").asc)
    val byKey = Window.partitionBy(col(keyCol))
    segs
      .withColumn("__r", row_number().over(byMean).cast("long"))
      .withColumn("__ns", count(lit(1)).over(byKey))
      .withColumn("symbol",
        expr(s"char(97 + (($SaxAlpha * (__r - 1)) div __ns))"))
      .select(col(keyCol), col("seg_idx"), col("n_bars"),
        (col("seg_mean") / lit(100.0)).as("seg_mean"), col("symbol"))
  }

  /** Per-key SAX word + cross-key word-shape frequency. */
  private[graft] def saxWords(df: DataFrame, keyCol: String, tsCol: String,
                              valCol: String, tieBreak: String): DataFrame = {
    val words = saxSegments(df, keyCol, tsCol, valCol, tieBreak)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_segs"),
        concat_ws("", sort_array(collect_list(
          struct(col("seg_idx"), col("symbol")))).getField("symbol"))
          .as("sax_word"))
    val freq = words.groupBy(col("sax_word"))
      .agg(count(lit(1)).as("n_keys_same_word"))
    words.join(freq, Seq("sax_word"))
      .select(col(keyCol), col("n_segs"), col("sax_word"),
        col("n_keys_same_word"))
  }

  val defs: Map[String, Q] = Map(
    "q_sax" -> ((s, dir) =>
      saxSegments(Tables.events(s, dir), "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc, col("seg_idx").asc)),
    "q_sax_words" -> ((s, dir) =>
      saxWords(Tables.events(s, dir), "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc)))

  private val segsSql =
    s"""t AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day,
       |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id
       |  FROM events),
       |bars AS (
       |  SELECT user_id, day, max(cl) AS close
       |  FROM (
       |    SELECT user_id, day,
       |      last_value(c) OVER (PARTITION BY user_id, day ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cl
       |    FROM t)
       |  GROUP BY user_id, day),
       |nb AS (
       |  SELECT user_id, day, close,
       |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
       |      AS BIGINT) AS i
       |  FROM bars),
       |segs AS (
       |  SELECT user_id, (i - 1) // $SaxSeg AS seg_idx,
       |    CAST(count(*) AS BIGINT) AS n_bars,
       |    CAST(sum(close) AS BIGINT) AS cs
       |  FROM nb GROUP BY 1, 2),
       |sm AS (
       |  SELECT user_id, seg_idx, n_bars,
       |    CAST(cs AS DOUBLE) / CAST(n_bars AS DOUBLE) AS seg_mean
       |  FROM segs),
       |sym AS (
       |  SELECT user_id, seg_idx, n_bars, seg_mean,
       |    chr(CAST(97 + (($SaxAlpha * (rr - 1)) // ns) AS INTEGER)) AS symbol
       |  FROM (
       |    SELECT *,
       |      CAST(row_number() OVER (PARTITION BY user_id
       |        ORDER BY seg_mean, seg_idx) AS BIGINT) AS rr,
       |      CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS ns
       |    FROM sm))""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_sax" ->
      s"""WITH $segsSql
         |SELECT user_id, seg_idx, n_bars, seg_mean / 100.0 AS seg_mean,
         |  symbol
         |FROM sym ORDER BY user_id, seg_idx""".stripMargin,

    "q_sax_words" ->
      s"""WITH $segsSql,
         |words AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_segs,
         |    string_agg(symbol, '' ORDER BY seg_idx) AS sax_word
         |  FROM sym GROUP BY user_id),
         |freq AS (
         |  SELECT sax_word, CAST(count(*) AS BIGINT) AS n_keys_same_word
         |  FROM words GROUP BY sax_word)
         |SELECT w.user_id, w.n_segs, w.sax_word, f.n_keys_same_word
         |FROM words w JOIN freq f USING (sax_word)
         |ORDER BY w.user_id""".stripMargin)
}
