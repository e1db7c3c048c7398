package graft.queries

import graft.Tables
import graft.sim.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third batch of training-data-pipeline operators: repetition-based
  * quality signals (the Gopher/RefinedWeb "excessive repetition" rules),
  * PII detection/redaction, and embedding-space outlier screening
  * against per-label centroids. Same parity discipline as Extensions:
  * integer counts, raw double division of identical operands, rounding
  * only where both engines provably hold identical operands.
  */
object Extensions3 {

  // PII patterns — Java-regex and RE2 compatible (no lookaround, no
  // backrefs), so Spark and DuckDB match identical spans.
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val UrlRe = "https?://[^ ]+"

  // embedding outlier flag: cosine-to-own-label-centroid below this
  private val OutlierCos = 0.0

  // context length for the sequence packer (matches the q_chunking grain)
  private val PackTokens = 64L

  val defs: Map[String, Q] = Map(
    // Token-repetition quality signals, per doc: duplicate-token ratio
    // (1 - distinct/total re-expressed as an exact count ratio) and the
    // dominant token's share — the two cheapest Gopher-style repetition
    // screens. Inverted-list shape: tokens explode once, per-token counts
    // partial-aggregate map-side, the per-doc argmax is a window over the
    // (doc, token) counts — never a per-row array sort. The dominant
    // token tie-breaks lexicographically so the cut is reproducible.
    "q_repetition" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), explode(graft.text.Text.tokens(col("text"))).as("tok"))
      val perTok = toks.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("n").desc, col("tok").asc)
      perTok
        .withColumn("__rn", row_number().over(w))
        .groupBy(col("doc_id"))
        .agg(sum("n").as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          max(when(col("__rn") === 1, col("tok"))).as("top_tok"),
          max(when(col("__rn") === 1, col("n"))).as("top_n"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          col("top_tok"), col("top_n"),
          ((col("n_tokens") - col("n_distinct")).cast("double") /
            col("n_tokens").cast("double")).as("dup_ratio"),
          (col("top_n").cast("double") / col("n_tokens").cast("double"))
            .as("top_ratio"))
        .orderBy(col("doc_id").asc)
    }),

    // OHLC candlestick bars — the reference dashboard's chart aggregation
    // (downsampling tick data to open/high/low/close per key per day).
    // Open/close come from explicit-full-frame first/last over the
    // totally-ordered (ts, event_id) window — the tie-safe formulation —
    // then one partial+final aggregate per (key, day) bar. The window
    // partitions by (key, day): distributed, never a global sort.
    "q_ohlc" -> ((s, dir) => {
      val day = col("ts").cast("date")
      val w = Window.partitionBy(col("user_id"), col("__day"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, dir)
        .withColumn("__day", day)
        .withColumn("__open", first(col("value")).over(w))
        .withColumn("__close", last(col("value")).over(w))
        .groupBy(col("user_id"), col("__day").as("day"))
        .agg(max("__open").as("open"), max("value").as("high"),
          min("value").as("low"), max("__close").as("close"),
          count(lit(1)).as("n_ticks"))
        .orderBy(col("user_id").asc, col("day").asc)
    }),

    // Data-quality assertion sweep — the pre-publish gate a pipeline runs
    // on every batch: each row is one named check with its measured count
    // and pass flag (contract columns non-null, id uniqueness,
    // referential integrity across tables, value-domain bounds). Shapes:
    // null/domain checks are map-side count aggregates; uniqueness is a
    // count-distinct; the FK check is a left-anti count — each the
    // minimal-shuffle form of its assertion.
    "q_dq_checks" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      def check(name: String, violations: org.apache.spark.sql.DataFrame) =
        violations.agg(count(lit(1)).as("violations"))
          .select(lit(name).as("check"), col("violations"),
            (col("violations") === 0L).as("ok"))
      Seq(
        check("events_key_not_null", e.filter(col("event_id").isNull ||
          col("user_id").isNull || col("ts").isNull)),
        check("events_id_unique", e.groupBy(col("event_id"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)),
        check("events_value_domain", e.filter(col("value") < 0.0 ||
          col("value").isNull)),
        check("orders_custkey_fk", o.join(c,
          o("o_custkey") === c("c_custkey"), "left_anti")))
        .reduce(_ unionByName _)
        .orderBy(col("check").asc)
    }),

    // Sequence PACKING: the step after chunking — chunks fill fixed-L
    // context bins by a running token count, bin = floor(tokens-before/L)
    // (greedy offset packing: deterministic, one window pass; exact
    // first-fit-decreasing is inherently sequential and buys little at
    // uniform chunk sizes). The running sum partitions BY SOURCE SHARD —
    // a global running sum would be a single-partition window, the
    // classic scale trap; per-shard packing is what a distributed packer
    // does anyway (each worker packs its shard independently).
    "q_packing" -> ((s, dir) => {
      val L = PackTokens
      val chunks = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          graft.text.Text.nTokens(col("text")).cast("long").as("n_tokens"))
        .withColumn("chunk_idx",
          explode(sequence(lit(0L), expr(s"(n_tokens + ${L - 1}) div $L - 1"))))
        .select(col("doc_id"), col("source"), col("chunk_idx"),
          (least(col("n_tokens"), (col("chunk_idx") + 1L) * L) -
            col("chunk_idx") * L).as("len"))
      val before = Window.partitionBy(col("source"))
        .orderBy(col("doc_id").asc, col("chunk_idx").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      chunks
        .withColumn("__before", coalesce(sum(col("len")).over(before), lit(0L)))
        .withColumn("bin_id", expr(s"__before div $L"))
        .groupBy(col("source"), col("bin_id"))
        .agg(count(lit(1)).as("n_chunks"), sum("len").as("bin_tokens"))
        .orderBy(col("source").asc, col("bin_id").asc)
    }),

    // Deterministic MIXTURE sampling: per-source keep rates (a pure
    // function of the source id — no RNG, reproducible on any cluster),
    // reported as kept/total/achieved-rate per source. The select itself
    // is a map-only filter; this is the dataset-weighting step of corpus
    // assembly.
    "q_mixture" -> ((s, dir) => {
      val rate = pmod(substring(col("source"), 4, 10).cast("int"), lit(3)) + 1
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), rate.as("rate"))
        .groupBy(col("source"), col("rate"))
        .agg(count(lit(1)).as("n_total"),
          count(when(pmod(col("doc_id"), col("rate")) === 0, 1)).as("n_kept"))
        .withColumn("achieved",
          col("n_kept").cast("double") / col("n_total").cast("double"))
        .orderBy(col("source").asc)
    }),

    // PII detect + redact. The corpus itself is synthetic and PII-free,
    // so deterministic PII is INJECTED first (a pure function of doc_id,
    // mirrored exactly in the oracle) — the operator under test is the
    // detection/redaction pass: occurrence counts per pattern and the
    // redacted length after replacing every match with a fixed tag.
    // Everything is a codegen'd regexp over one projection — at 100 TB
    // this is a map-only pass, no shuffle.
    "q_pii_redact" -> ((s, dir) => {
      val injected = concat(
        col("text"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit(" see https://docs.example.org/d/"), col("doc_id")))
          .otherwise(lit("")))
      Tables.documents(s, dir)
        .select(col("doc_id"), injected.as("__t"))
        .select(col("doc_id"),
          regexp_count(col("__t"), lit(EmailRe)).as("n_emails"),
          regexp_count(col("__t"), lit(UrlRe)).as("n_urls"),
          length(col("__t")).as("len_raw"),
          length(regexp_replace(regexp_replace(col("__t"), EmailRe, "<EMAIL>"),
            UrlRe, "<URL>")).as("len_redacted"))
        .orderBy(col("doc_id").asc)
    }),

    // Embedding-space outlier screen: each vector's cosine to its OWN
    // label's centroid, flagged when below threshold — the "does this
    // example belong to its cluster" filter a curation pipeline runs
    // after labeling. Centroid = elementwise mean via posexplode +
    // groupBy(label, pos) (partial-aggregated, the corpus never
    // collects). PARITY: a float mean is accumulation-order-dependent
    // (Spark's partial aggregation vs DuckDB's sequential scan differ in
    // the last ulp, and rounding an almost-boundary value can then
    // diverge), so components quantize to EXACT integers first —
    // floor(v·1e6 + 0.5) as long — whose sum is order-independent; the
    // mean is then one double division of identical operands in both
    // engines, bit-exact with no rounding at all. The 1e-6 quantization
    // is far below float precision at these magnitudes.
    "q_embed_outliers" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cent = emb
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(sum(floor(col("v").cast("double") * lit(1000000.0) + lit(0.5))
            .cast("long")).as("s"),
          count(lit(1)).as("cnt"))
        .select(col("label"), col("pos"),
          (col("s").cast("double") /
            (col("cnt").cast("double") * lit(1000000.0))).as("m"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("label"), transform(col("pm"), s => s.getField("m")).as("centroid"))
      emb.join(broadcast(cent), "label")
        .withColumn("cos_c",
          round(Similarity.cosine(col("embedding"), col("centroid")), 4))
        .select(col("vec_id"), col("label"), col("cos_c"),
          (col("cos_c") < OutlierCos).as("is_outlier"))
        .orderBy(col("vec_id").asc)
    }))

  val oracle: Map[String, String] = Map(
    "q_repetition" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest(${Extensions.sqlTokens("text")}) AS tok
        |  FROM documents),
        |per_tok AS (
        |  SELECT doc_id, tok, count(*) AS n FROM toks GROUP BY doc_id, tok),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY n DESC, tok) AS rn
        |  FROM per_tok)
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
        |  max(CASE WHEN rn = 1 THEN tok END) AS top_tok,
        |  max(CASE WHEN rn = 1 THEN n END) AS top_n,
        |  CAST(sum(n) - count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS dup_ratio,
        |  CAST(max(CASE WHEN rn = 1 THEN n END) AS DOUBLE)
        |    / CAST(sum(n) AS DOUBLE) AS top_ratio
        |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_ohlc" ->
      """WITH w AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, value,
        |    first_value(value) OVER bar AS open,
        |    last_value(value) OVER bar AS close
        |  FROM events
        |  WINDOW bar AS (PARTITION BY user_id, CAST(ts AS DATE)
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, day, max(open) AS open, max(value) AS high,
        |  min(value) AS low, max(close) AS close, count(*) AS n_ticks
        |FROM w GROUP BY user_id, day ORDER BY user_id, day""".stripMargin,

    "q_dq_checks" ->
      """SELECT * FROM (
        |  SELECT 'events_key_not_null' AS "check", count(*) AS violations,
        |    count(*) = 0 AS ok
        |  FROM events
        |  WHERE event_id IS NULL OR user_id IS NULL OR ts IS NULL
        |  UNION ALL
        |  SELECT 'events_id_unique', count(*), count(*) = 0 FROM (
        |    SELECT event_id FROM events GROUP BY event_id HAVING count(*) > 1)
        |  UNION ALL
        |  SELECT 'events_value_domain', count(*), count(*) = 0
        |  FROM events WHERE value < 0.0 OR value IS NULL
        |  UNION ALL
        |  SELECT 'orders_custkey_fk', count(*), count(*) = 0
        |  FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        |ORDER BY "check"""".stripMargin,

    "q_packing" ->
      s"""WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(${Extensions.sqlTokens("text")}) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    unnest(range(0, (n_tokens + ${PackTokens - 1}) // $PackTokens))
        |      AS chunk_idx
        |  FROM t),
        |chunks AS (
        |  SELECT doc_id, source, chunk_idx,
        |    least(n_tokens, (chunk_idx + 1) * $PackTokens)
        |      - chunk_idx * $PackTokens AS len
        |  FROM c),
        |binned AS (
        |  SELECT source,
        |    coalesce(sum(len) OVER (PARTITION BY source
        |      ORDER BY doc_id, chunk_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      // $PackTokens AS bin_id,
        |    len
        |  FROM chunks)
        |SELECT source, CAST(bin_id AS BIGINT) AS bin_id, count(*) AS n_chunks,
        |  CAST(sum(len) AS BIGINT) AS bin_tokens
        |FROM binned GROUP BY source, bin_id ORDER BY source, bin_id""".stripMargin,

    "q_mixture" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    CAST(CAST(substr(source, 4) AS INTEGER) % 3 + 1 AS INTEGER) AS rate
        |  FROM documents)
        |SELECT source, rate, count(*) AS n_total,
        |  count(CASE WHEN doc_id % rate = 0 THEN 1 END) AS n_kept,
        |  CAST(count(CASE WHEN doc_id % rate = 0 THEN 1 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS achieved
        |FROM r GROUP BY source, rate ORDER BY source""".stripMargin,

    "q_pii_redact" ->
      s"""WITH injected AS (
        |  SELECT doc_id,
        |    text
        |      || CASE WHEN doc_id % 5 = 0
        |           THEN ' contact user' || doc_id || '@example.com' ELSE '' END
        |      || CASE WHEN doc_id % 7 = 0
        |           THEN ' see https://docs.example.org/d/' || doc_id ELSE '' END
        |      AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '$EmailRe')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '$UrlRe')) AS INTEGER) AS n_urls,
        |  CAST(len(t) AS INTEGER) AS len_raw,
        |  CAST(len(regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
        |    '$UrlRe', '<URL>', 'g')) AS INTEGER) AS len_redacted
        |FROM injected ORDER BY doc_id""".stripMargin,

    "q_embed_outliers" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |dims AS (
        |  SELECT label, i,
        |    CAST(sum(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |      / (CAST(count(*) AS DOUBLE) * 1000000.0) AS m
        |  FROM (SELECT label, unnest(v) AS x,
        |          unnest(range(1, len(v) + 1)) AS i FROM e)
        |  GROUP BY label, i),
        |cent AS (SELECT label, list(m ORDER BY i) AS c FROM dims GROUP BY label)
        |SELECT vec_id, e.label,
        |  round(list_dot_product(v, c)
        |    / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(c, c))), 4) AS cos_c,
        |  round(list_dot_product(v, c)
        |    / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(c, c))), 4)
        |    < $OutlierCos AS is_outlier
        |FROM e JOIN cent USING (label) ORDER BY vec_id""".stripMargin)
}
