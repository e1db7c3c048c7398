package graft.queries

import graft.Tables
import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tenth extension wave — statistical screens a data pipeline runs over
  * raw feeds before trusting them, plus corpus readability scoring:
  *
  *  - Benford first-digit screen (fabricated/synthetic-feed detection on
  *    monetary columns — the classic forensic DQ check);
  *  - lag-1 autocorrelation per series (mean-reversion vs momentum — and
  *    a shuffled-feed tripwire: real tick series are autocorrelated);
  *  - exponential time-decay trending score (the "what is hot now"
  *    ranking behind every dashboard home page);
  *  - Flesch-style readability bands over the document corpus (a
  *    training-data quality dimension orthogonal to q_text_quality).
  *
  * Scale shapes: Benford and trending are single-scan partial aggregates
  * to a ≤|digits| / |types| frame with the denominator broadcast as a
  * scalar (house q_pct_total stance, TopK.scala:49-57); autocorrelation
  * is one lag window + per-key co-moment aggregate; readability is a
  * stateless per-row projection. Float discipline: digit extraction is
  * integer end-to-end (no log10 bucketing — libm ulps cannot move a
  * digit); divisions are identical-operand; rounding at emit only.
  */
object Extensions9 {

  /** First significant digit of a positive 2-dp monetary double, via
    * integer cents: cast(x*100) truncates identically in both engines on
    * the identical double product, and the leading digit of the integer
    * string is ulp-immune (a last-cent truncation cannot change the
    * leading digit unless the true value sits ON a power of ten — where
    * both engines truncate the same stored double the same way). */
  private[graft] def firstDigit(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring((c * 100.0).cast("long").cast("string"), 1, 1).cast("int")

  /** Per-key lag-1 autocorrelation: Pearson corr of (value, previous
    * value) over the totally-ordered series — one window shuffle, one
    * co-moment aggregate per key. */
  private[graft] def lag1Autocorr(df: DataFrame, keyCol: String, valCol: String,
                                  ordCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val ord = Window.partitionBy(col(keyCol)).orderBy(ordCols: _*)
    df.withColumn("__prev", lag(col(valCol), 1).over(ord))
      .filter(col("__prev").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_pairs"),
        round(corr(col(valCol), col("__prev")), 4).as("r1"))
  }

  /** Benford first-digit screen over a positive 2-dp monetary column:
    * observed share per leading digit vs the log10(1+1/d) expectation.
    * One scan → ≤9-row aggregate; the denominator is a broadcast scalar
    * (house q_pct_total stance), and log10 runs only on the 9 digit
    * constants — far from any rounding boundary. */
  private[graft] def benford(df: DataFrame, valCol: String): DataFrame = {
    val priced = df.filter(col(valCol) > 0)
    val perDigit = priced
      .groupBy(firstDigit(col(valCol)).as("digit"))
      .agg(count(lit(1)).as("n"))
    val total = priced.agg(count(lit(1)).as("__tot"))
    perDigit.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(col("n") / col("__tot"), 4).as("share"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 4).as("benford"),
        round(col("n") / col("__tot") - log10(lit(1.0) + lit(1.0) / col("digit")), 4)
          .as("dev"))
  }

  /** Half-life-weighted activity per group: weight = 0.5^(age_days / halfLife)
    * with the INTEGER day age measured against the frame's max day
    * (broadcast scalar — one tiny agg, never a global window). */
  private[graft] def decayScores(df: DataFrame, grpCol: String, valCol: String,
                                 dayCol: String, halfLifeDays: Double): DataFrame = {
    val maxDay = df.agg(max(col(dayCol)).as("__maxd"))
    df.crossJoin(broadcast(maxDay))
      .withColumn("__w", pow(lit(0.5), datediff(col("__maxd"), col(dayCol)) / lit(halfLifeDays)))
      .groupBy(col(grpCol))
      .agg(count(lit(1)).as("n"),
        round(sum(col(valCol)), 4).as("raw_sum"),
        round(sum(col(valCol) * col("__w")), 4).as("decay_score"))
  }

  /** Flesch-style readability projection over (doc_id, text): house
    * tokenization for words, punctuation runs for sentences (min 1),
    * vowel-group runs as the syllable proxy. The score is NOT rounded:
    * inputs are exact integers, so the literal/divide/subtract chain is
    * bit-identical IEEE in both engines — while round() diverges exactly
    * on .xx5 boundaries (Spark rounds the shortest decimal repr, DuckDB
    * the binary double; parity rule from q_scalar_funcs' price_k). */
  private[graft] def readability(df: DataFrame): DataFrame = {
    val t = col("text")
    df.withColumn("n_words", greatest(Text.nTokens(t), lit(1)))
      .withColumn("n_sents",
        greatest(size(regexp_extract_all(t, lit("[.!?]+"), lit(0))), lit(1)))
      .withColumn("n_vowel_groups",
        size(regexp_extract_all(lower(t), lit("[aeiouy]+"), lit(0))))
      .withColumn("flesch",
        lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") / col("n_sents").cast("double"))
          - lit(84.6) * (col("n_vowel_groups").cast("double") / col("n_words").cast("double")))
      .withColumn("band",
        when(col("flesch") >= 60.0, lit("easy"))
          .when(col("flesch") >= 30.0, lit("standard"))
          .otherwise(lit("hard")))
  }

  val defs: Map[String, Q] = Map(
    // Benford's-law screen on order prices: observed first-digit share vs
    // the log10(1+1/d) expectation. One scan → 9-row aggregate; the
    // total is a broadcast scalar (never a global window over data rows).
    // Digit extraction is integer-only; log10 runs on the 9 digit
    // constants, so libm ulps land far from the 4-dp rounding boundary.
    "q_benford" -> ((s, dir) =>
      benford(Tables.orders(s, dir), "o_totalprice")
        .orderBy(col("digit").asc)),

    // Lag-1 autocorrelation per price series: r1 > 0 momentum, r1 < 0
    // mean-reversion, r1 ≈ 0 for a shuffled/fabricated feed.
    "q_autocorr" -> ((s, dir) =>
      lag1Autocorr(Tables.events(s, dir), "user_id", "value",
        Seq(col("ts").asc, col("event_id").asc))
        .orderBy(col("user_id").asc)),

    // Exponential time-decay trending: half-life-weighted activity per
    // event type, weights from the INTEGER day age against the corpus
    // max day (broadcast scalar) — "hot now" beats "big last month".
    "q_decay_trend" -> ((s, dir) =>
      decayScores(
        Tables.events(s, dir).withColumn("__day", col("ts").cast("date")),
        "event_type", "value", "__day", halfLifeDays = 7.0)
        .orderBy(col("event_type").asc)),

    // Flesch-style readability per document: house tokenization for the
    // word count, sentence count from punctuation runs (min 1), syllable
    // proxy = vowel-group runs. Stateless projection — no shuffle at all
    // beyond the output sort.
    "q_readability" -> ((s, dir) =>
      readability(Tables.documents(s, dir))
        .select(col("doc_id"), col("n_words"), col("n_sents"),
          col("n_vowel_groups"), col("flesch"), col("band"))
        .orderBy(col("doc_id").asc)))

  val oracle: Map[String, String] = Map(
    "q_benford" ->
      """WITH priced AS (SELECT o_totalprice FROM orders WHERE o_totalprice > 0),
        |d AS (
        |  SELECT CAST(substr(CAST(CAST(o_totalprice * 100.0 AS BIGINT) AS VARCHAR), 1, 1)
        |           AS INTEGER) AS digit,
        |    count(*) AS n
        |  FROM priced GROUP BY 1),
        |t AS (SELECT count(*) AS tot FROM priced)
        |SELECT digit, n,
        |  round(n / tot, 4) AS share,
        |  round(log10(1.0 + 1.0 / digit), 4) AS benford,
        |  round(n / tot - log10(1.0 + 1.0 / digit), 4) AS dev
        |FROM d, t ORDER BY digit""".stripMargin,

    "q_autocorr" ->
      """WITH p AS (
        |  SELECT user_id, value,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT user_id, count(*) AS n_pairs, round(corr(value, prev), 4) AS r1
        |FROM p WHERE prev IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_decay_trend" ->
      """WITH e AS (SELECT event_type, value, CAST(ts AS DATE) AS day FROM events),
        |m AS (SELECT max(day) AS maxd FROM e)
        |SELECT event_type, count(*) AS n,
        |  round(sum(value), 4) AS raw_sum,
        |  round(sum(value * pow(0.5, date_diff('day', day, maxd) / 7.0)), 4)
        |    AS decay_score
        |FROM e, m GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_readability" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    greatest(len(${Extensions.sqlTokens("text")}), 1) AS n_words,
        |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sents,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_vowel_groups
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    CAST(n_words AS INTEGER) AS n_words,
        |    CAST(n_sents AS INTEGER) AS n_sents,
        |    CAST(n_vowel_groups AS INTEGER) AS n_vowel_groups,
        |    206.835
        |      - 1.015 * (n_words::DOUBLE / n_sents::DOUBLE)
        |      - 84.6 * (n_vowel_groups::DOUBLE / n_words::DOUBLE) AS flesch
        |  FROM t)
        |SELECT doc_id, n_words, n_sents, n_vowel_groups, flesch,
        |  CASE WHEN flesch >= 60.0 THEN 'easy'
        |       WHEN flesch >= 30.0 THEN 'standard'
        |       ELSE 'hard' END AS band
        |FROM f ORDER BY doc_id""".stripMargin)
}
