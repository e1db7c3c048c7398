package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Fifth batch of training-data-pipeline operators — the provisioning
  * set: deterministic hash-based train/valid/test split (the only split
  * that stays stable as the corpus grows — row-number splits reshuffle
  * every document when one upstream doc appears), URL structure
  * extraction checked against a closed-form truth, and the
  * quantile-sketch scale path with its rank guarantee bound-asserted
  * per group (the `q_approx_distinct` trick).
  */
object Extensions5 {

  /** Split fractions in percent: [0,80) train, [80,90) valid, rest test. */
  private val TrainPct = 80
  private val ValidPct = 90

  /** Deterministic bucket in [0,100) from the doc id: first 15 hex
    * digits (60 bits — exact in an int64) of md5, mod 100. The md5 step
    * is what makes the split UNCORRELATED with id assignment order —
    * `doc_id % 100` would stripe systematically with any id-sequential
    * upstream ordering. DuckDB mirror below is digit-identical. */
  private def splitBucket(id: org.apache.spark.sql.Column) =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(100L))

  val defs: Map[String, Q] = Map(
    // Hash split ledger: per-split doc and char counts. The split
    // decision is a pure per-row expression — no shuffle beyond the
    // 3-group aggregate, and any executor can answer "which split is
    // doc X in" without consulting anything.
    "q_hash_split" -> ((s, dir) => {
      val b = splitBucket(col("doc_id"))
      Tables.documents(s, dir)
        .withColumn("split",
          when(b < TrainPct, "train").when(b < ValidPct, "valid")
            .otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
        .orderBy(col("split").asc)
    }),

    // URL structure extraction: the crawl-curation step that turns a
    // document's URL into (host, path, query-param) features. The URLs
    // are synthesized in-query from document fields, so the oracle can
    // state each component CLOSED FORM from the same fields — the
    // engine's actual parser (`parse_url`, codegen'd Catalyst
    // expression, not a UDF) is tested against ground truth rather than
    // against another parser's quirks.
    "q_url_parse" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(lit("https://"), col("source"), lit(".example.com/"),
            col("lang"), lit("/"), col("doc_id").cast("string"),
            lit("?ref="), pmod(col("doc_id"), lit(7)).cast("string"),
            lit("&utm=x")).as("url"))
        .select(col("doc_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref"))
        .orderBy(col("doc_id").asc)
    }),

    // Quantile sketch with the rank guarantee bound-asserted: the
    // sketch (mergeable, fixed memory — the reason it replaces exact
    // percentile at 100 TB) reports p50/p90 per event type; the query
    // then counts exactly how many values sit at or below each reported
    // quantile and asserts the rank lands within ±1% of the target —
    // far looser than the sketch's 1e-4 guarantee, so the boolean is
    // stable across merge orders, yet tight enough that a broken sketch
    // (or a wrong percentile definition) fails loudly. The oracle
    // states the bound as literal truth.
    "q_quantile_sketch" -> ((s, dir) =>
      quantileSketchReport(
        Tables.events(s, dir).select(col("event_type"), col("value")))))

  /** The q_quantile_sketch pipeline over any (event_type, value) frame —
    * factored so a spec can drive it at adversarially small n. The rank
    * band is `target·n ± (0.01·n + 1)`: the relative term is the real
    * guarantee being asserted; the additive +1 absorbs rank
    * DISCRETENESS, without which the band is unsatisfiable at small n
    * (n = 11: the sketch returns a data value, so le50 ≥ 6, but
    * 11 × 0.51 = 5.61 — a correct sketch would read as broken and flip
    * the driver's green row red on a small-group corpus). At any n
    * where 0.01·n ≥ 1 the additive term is dominated and the bound is
    * the pure ±1% it always was. */
  private[graft] def quantileSketchReport(
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    def bandOk(le: org.apache.spark.sql.Column, q: Double) =
      le >= col("n") * q - col("n") * 0.01 - 1 &&
        le <= col("n") * q + col("n") * 0.01 + 1
    val g = e.groupBy(col("event_type"))
      .agg(percentile_approx(col("value"), array(lit(0.5), lit(0.9)),
        lit(10000)).as("ap"))
      .select(col("event_type"), col("ap")(0).as("p50"), col("ap")(1).as("p90"))
    e.join(g, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") <= col("p50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("value") <= col("p90"), 1L).otherwise(0L)).as("le90"))
      .select(col("event_type"), col("n"),
        bandOk(col("le50"), 0.5).as("p50_ok"),
        bandOk(col("le90"), 0.9).as("p90_ok"))
      .orderBy(col("event_type").asc)
  }

  val oracle: Map[String, String] = Map(
    "q_hash_split" ->
      s"""WITH s AS (
         |  SELECT CASE
         |    WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |      % 100 < $TrainPct THEN 'train'
         |    WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |      % 100 < $ValidPct THEN 'valid'
         |    ELSE 'test' END AS split, n_chars
         |  FROM documents)
         |SELECT split, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS n_chars
         |FROM s GROUP BY split ORDER BY split""".stripMargin,

    // Each URL component restated from the generating fields — the
    // closed-form ground truth the engine's parser must reproduce.
    "q_url_parse" ->
      """SELECT doc_id,
        |  source || '.example.com' AS host,
        |  '/' || lang || '/' || CAST(doc_id AS VARCHAR) AS path,
        |  CAST(doc_id % 7 AS VARCHAR) AS ref
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_quantile_sketch" ->
      """SELECT event_type, count(*) AS n, true AS p50_ok, true AS p90_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
