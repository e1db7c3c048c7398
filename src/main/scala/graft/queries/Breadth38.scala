package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirty-eighth wave — volume-normalized movement and corpus growth:
  *
  *  - **Ease of Movement** (14-bar): how far price midpoints travel
  *    per unit of traded volume — in the AGGREGATE-RATIO form
  *    (Σ(midpoint-move · range) / Σvolume over the window, both
  *    integer sums, ONE division) rather than the order-dependent
  *    mean-of-ratios the textbook writes;
  *  - **vocabulary growth curve** (Heaps' law): distinct-token count
  *    at each decile prefix of the corpus (docs ordered by doc_id) —
  *    the scaling diagnostic a tokenizer/vocab budget is planned
  *    against. Each token contributes its FIRST-occurrence rank; the
  *    curve is 10 threshold counts over the |vocab|-sized first-rank
  *    table, all integer arithmetic (thresholds via integer ceiling
  *    division).
  *
  * Scale shape: EMV rides the memoized bar grid + day-vol grid (the
  * q_nvi_pvi join) and one key window; vocab growth is one doc-rank
  * (|docs|-sized, the q_ks_drift altitude), one posting min per
  * token, and a 10×|vocab| threshold probe — never doc × vocab.
  */
object Breadth38 {

  private[graft] val EmvW = 14
  private[graft] val VocabDeciles = 10

  /** EMV(14) per key: 2·midpoint-move mm = (H+L) − (pH+pL), per-bar
    * num = mm·(H−L) (integer), den = day volume; windowed Σnum/Σden
    * with one terminal division — positive-volume full windows only.
    * Days without parseable volume DROP (the q_nvi_pvi stance). */
  private[graft] def emv(df: DataFrame, keyCol: String, tsCol: String,
                         valCol: String, tieBreak: String,
                         qtyJsonField: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val f = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(-(EmvW - 1), 0)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .join(Breadth27.dayVols(df, keyCol, tsCol, qtyJsonField),
        Seq(keyCol, "day"))
      .withColumn("__ph", lag(col("high"), 1).over(w))
      .withColumn("__pl", lag(col("low"), 1).over(w))
      .filter(col("__ph").isNotNull)
      .withColumn("__num",
        ((col("high") + col("low")) - (col("__ph") + col("__pl")))
          * (col("high") - col("low")))
      .withColumn("__n", count(lit(1)).over(f))
      .withColumn("__sn", sum(col("__num")).over(f))
      .withColumn("__sv", sum(col("__v")).over(f))
      .filter(col("__n") === EmvW)
      .select(col(keyCol), col("day"), col("close").as("close_cents"),
        when(col("__sv") > 0,
          col("__sn").cast("double") / col("__sv").cast("double"))
          .as("emv"))
  }

  /** Heaps-law vocabulary growth: per corpus decile (docs ordered by
    * doc_id), the cumulative distinct-token count and the decile's
    * new-token increment. Thresholds are integer ceiling divisions
    * T_k = ⌈k·n/10⌉; a token counts toward decile k when its first
    * occurrence rank is ≤ T_k. */
  private[graft] def vocabGrowth(docs: DataFrame): DataFrame = {
    val rk = Window.orderBy(col("doc_id").asc)
    val ranked = docs
      .select(col("doc_id"),
        explode(array_distinct(graft.text.Text.tokens(col("text"))))
          .as("tok"))
      .join(docs.select(col("doc_id"),
        row_number().over(rk).as("__rk")), Seq("doc_id"))
    val firstRk = ranked.groupBy(col("tok"))
      .agg(min(col("__rk")).as("__frk"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val ks = docs.sparkSession.range(1, VocabDeciles + 1)
      .select(col("id").as("decile"))
    val thresholds = ks.crossJoin(broadcast(n))
      .select(col("decile"),
        ((col("decile") * col("__n") + lit(VocabDeciles - 1))
          / lit(VocabDeciles)).cast("long").as("n_docs_prefix"))
    thresholds.join(firstRk,
        col("__frk") <= col("n_docs_prefix"), "left")
      .groupBy(col("decile"), col("n_docs_prefix"))
      .agg(count(col("tok")).as("vocab_size"))
      .withColumn("new_tokens",
        col("vocab_size") - coalesce(
          lag(col("vocab_size"), 1).over(Window.orderBy(col("decile").asc)),
          lit(0L)))
      .select(col("decile"), col("n_docs_prefix"), col("vocab_size"),
        col("new_tokens"))
  }

  val defs: Map[String, Q] = Map(
    // Ease of Movement: windowed integer aggregate-ratio.
    "q_emv" -> ((s, dir) =>
      emv(Tables.events(s, dir), "user_id", "ts", "value", "event_id", "k")
        .orderBy(col("user_id").asc, col("day").asc)),

    // Heaps-law vocabulary growth over corpus deciles.
    "q_vocab_growth" -> ((s, dir) =>
      vocabGrowth(Tables.documents(s, dir)).orderBy(col("decile").asc)))

  val oracle: Map[String, String] = Map(
    "q_emv" ->
      s"""WITH t AS (
         |  SELECT user_id, CAST(ts AS DATE) AS day,
         |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id, props
         |  FROM events),
         |bars AS (
         |  SELECT user_id, day, max(cl) AS close, max(c) AS high, min(c) AS low
         |  FROM (
         |    SELECT user_id, day, c,
         |      last_value(c) OVER (PARTITION BY user_id, day ORDER BY ts, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cl
         |    FROM t)
         |  GROUP BY user_id, day),
         |vols AS (
         |  SELECT user_id, day,
         |    CAST(sum(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS v
         |  FROM t GROUP BY user_id, day),
         |bv AS (
         |  SELECT b.user_id, b.day, b.close, b.high, b.low, v.v
         |  FROM bars b JOIN vols v ON b.user_id = v.user_id AND b.day = v.day
         |  WHERE v.v IS NOT NULL),
         |d AS (
         |  SELECT user_id, day, close, high, low, v,
         |    lag(high) OVER w AS ph, lag(low) OVER w AS pl
         |  FROM bv
         |  WINDOW w AS (PARTITION BY user_id ORDER BY day)),
         |e AS (
         |  SELECT user_id, day, close,
         |    ((high + low) - (ph + pl)) * (high - low) AS num, v
         |  FROM d WHERE ph IS NOT NULL),
         |f AS (
         |  SELECT user_id, day, close,
         |    count(*) OVER w AS n,
         |    CAST(sum(num) OVER w AS BIGINT) AS sn,
         |    CAST(sum(v) OVER w AS BIGINT) AS sv
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN ${EmvW - 1} PRECEDING AND CURRENT ROW))
         |SELECT user_id, day, close AS close_cents,
         |  CASE WHEN sv > 0
         |    THEN CAST(sn AS DOUBLE) / CAST(sv AS DOUBLE) END AS emv
         |FROM f WHERE n = $EmvW ORDER BY user_id, day""".stripMargin,

    "q_vocab_growth" ->
      s"""WITH rk AS (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS r
         |  FROM documents),
         |dt AS (
         |  SELECT d.doc_id, unnest(list_distinct(${Extensions.sqlTokens("text")}))
         |      AS tok
         |  FROM documents d),
         |fr AS (
         |  SELECT dt.tok, min(rk.r) AS frk
         |  FROM dt JOIN rk ON dt.doc_id = rk.doc_id
         |  GROUP BY dt.tok),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents),
         |th AS (
         |  SELECT k.decile,
         |    (k.decile * n.nn + ${VocabDeciles - 1}) // $VocabDeciles
         |      AS n_docs_prefix
         |  FROM (SELECT unnest(range(1, ${VocabDeciles + 1})) AS decile) k
         |  CROSS JOIN n),
         |vc AS (
         |  SELECT th.decile, th.n_docs_prefix,
         |    CAST(count(fr.tok) AS BIGINT) AS vocab_size
         |  FROM th LEFT JOIN fr ON fr.frk <= th.n_docs_prefix
         |  GROUP BY th.decile, th.n_docs_prefix)
         |SELECT decile, n_docs_prefix, vocab_size,
         |  vocab_size - coalesce(lag(vocab_size) OVER (ORDER BY decile), 0)
         |    AS new_tokens
         |FROM vc ORDER BY decile""".stripMargin)
}
