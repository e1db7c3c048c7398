package graft.queries

import graft.Tables
import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eighth extension wave — corpus information-theory + graph authority:
  *
  *  - per-document token entropy (the Shannon diversity of the token
  *    distribution — low-entropy docs are boilerplate/spam candidates;
  *    the standard cheap quality signal next to q_repetition);
  *  - PMI co-occurrence over a CAPPED vocabulary (top-100 corpus
  *    tokens): collocation mining whose pair space is bounded by
  *    |docs|·C(cap,2) regardless of corpus size — the uncapped form is
  *    quadratic in document length and never ships;
  *  - unigram language-model scoring (add-1 smoothed corpus LM, per-doc
  *    mean log-prob + perplexity — the CCNet-style "does this look like
  *    the corpus" filter that precedes expensive model-based scoring);
  *  - 3-iteration PageRank over the verified near-dup graph (which
  *    duplicate is the AUTHORITY of its cluster — a principled keeper
  *    choice; reuses the memoized pairs frame every other graph query
  *    shares).
  *
  * Parity rules: all logs are log2 on identical double operands, emitted
  * values rounded at the boundary only; counts stay in the integer
  * domain until the final division.
  */
object Extensions8 {

  /** PMI vocabulary cap: pairs are mined only among the top-K corpus
    * tokens, so per-doc pair fan-out is ≤ C(K,2) — a constant — and the
    * aggregate is ≤ C(K,2) rows however large the corpus. */
  private val PmiVocab = 100

  /** PageRank damping / teleport as INDEPENDENT decimal literals: both
    * engines parse "0.85"/"0.15" to the same nearest doubles, while a
    * computed 1.0 - 0.85 differs from literal 0.15 in the last ulp. */
  private val Damping = 0.85
  private val Teleport = 0.15
  private val PrIters = 3

  /** Fixed-iteration PageRank over an undirected pair list (id_a, id_b).
    * Every node has degree ≥ 1 by construction (it appears in a pair),
    * so rank mass never sinks. Each iteration is one edges⋈ranks join +
    * one groupBy — |edges|-sized shuffles carrying (id, double), never
    * payloads. Driver loop only composes the plan; no per-iteration
    * action. */
  private[graft] def pagerank(pairs: DataFrame, iters: Int): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    val nd = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
    val nN = nd.agg(count(lit(1)).as("n_nodes"))
    var r = nd.crossJoin(nN)
      .select(col("node"), col("deg"), (lit(1.0) / col("n_nodes")).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(r.select(col("node").as("u"), (col("pr") / col("deg")).as("share")),
          col("src") === col("u"))
        .groupBy(col("dst")).agg(sum(col("share")).as("acc"))
      r = nd.join(contrib, nd("node") === contrib("dst"), "left")
        .crossJoin(nN)
        .select(nd("node"), nd("deg"),
          (lit(Teleport) / col("n_nodes") +
            lit(Damping) * coalesce(col("acc"), lit(0.0))).as("pr"))
    }
    r.select(col("node"), col("pr"))
  }

  val defs: Map[String, Q] = Map(
    // Token entropy: H = log2(n) − Σ c·log2(c) / n over the per-doc
    // token counts — one explode + two aggregates (map-side partial on
    // both), the sums in the count domain until the single final
    // division. Low H at normal length = repeated-token boilerplate.
    "q_token_entropy" -> ((s, dir) => {
      val perTok = Tables.documents(s, dir)
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      perTok.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"),
          sum(col("c").cast("double") * log2(col("c").cast("double"))).as("clc"))
        .select(col("doc_id"), col("n_tokens"),
          round(log2(col("n_tokens").cast("double")) - col("clc") / col("n_tokens"), 4)
            .as("h_bits"))
        .orderBy(col("doc_id").asc)
    }),

    // PMI collocations over the capped vocabulary: per-doc DISTINCT
    // top-vocab tokens (memoized — the pair enumeration and the
    // doc-frequency aggregate read it), then PMI from integer counts
    // (products < 2^53, so the double conversion is exact in both
    // engines). Top-20 under a total order → TakeOrderedAndProject,
    // never a global sort.
    //
    // Pair enumeration (round 15, guide §2.3/§2.4 — the round-14
    // verdict's q_pmi_cooccur regression item): the doc_id SELF-JOIN
    // (two exchanges at scale — locally a lucky broadcast — emitting k²
    // rows per doc, filtered to C(k,2)) is replaced by a per-doc
    // 128-BIT VOCABULARY BITMASK: each top-vocab token maps to a rank
    // 0..PmiVocab−1 (tok-ascending over the ≤100-row capped vocab — an
    // aggregate-sized frame, so the rank window is metadata work), each
    // doc folds its ranks into two longs with bit_or (a codegen hash
    // aggregate with map-side partials — only |docs| 24-byte rows reach
    // the exchange), and the C(k,2) ordered pairs are enumerated
    // map-side from the mask as INT pairs, partial-aggregating in the
    // same stage to ≤ C(PmiVocab,2) = 4950 groups. Token strings rejoin
    // on the 100-row broadcast only after the aggregate. Per-doc state
    // is two longs — scale-safe at 100 TB by the vocabulary cap.
    // Equivalence: dt is distinct per (doc, tok), rank order is tok
    // ASC, so rank-order (i < j) enumeration yields exactly the
    // self-join's {tok_a < tok_b} pair multiset — identical n_ab.
    "q_pmi_cooccur" -> ((s, dir) => {
      val top = Extensions4.tokenCounts(s, dir)
        .orderBy(col("true_n").desc, col("tok").asc).limit(PmiVocab)
        .select(col("tok"))
      val dt = Extensions.memoized(s, s"pmitok|$dir") {
        Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(array_distinct(Text.tokens(col("text")))).as("tok"))
          .join(top, Seq("tok"), "left_semi")
      }
      val nf = dt.groupBy(col("tok")).agg(count(lit(1)).as("nd"))
      val nDocs = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
      val ranked = top.select(col("tok"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("tok").asc)) - 1).as("__rk"))
      val masks = dt.join(broadcast(ranked), Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(expr("bit_or(CASE WHEN __rk < 64 THEN shiftleft(1L, __rk) " +
              "ELSE 0L END)").as("__lo"),
          expr("bit_or(CASE WHEN __rk >= 64 THEN shiftleft(1L, __rk - 64) " +
              "ELSE 0L END)").as("__hi"))
      masks
        .select(expr(s"filter(sequence(0, ${PmiVocab - 1}), r -> " +
          "CASE WHEN r < 64 THEN (__lo & shiftleft(1L, r)) != 0 " +
          "ELSE (__hi & shiftleft(1L, r - 64)) != 0 END)").as("__rs"))
        .select(explode(expr(
          "flatten(transform(__rs, (a, i) -> transform(" +
            "slice(__rs, i + 2, greatest(size(__rs) - i - 1, 0)), " +
            "b -> named_struct('ra', a, 'rb', b))))")).as("__p"))
        .select(col("__p.ra").as("ra"), col("__p.rb").as("rb"))
        .groupBy(col("ra"), col("rb")).agg(count(lit(1)).as("n_ab"))
        .join(broadcast(ranked.select(col("__rk").as("ra"),
          col("tok").as("tok_a"))), Seq("ra"))
        .join(broadcast(ranked.select(col("__rk").as("rb"),
          col("tok").as("tok_b"))), Seq("rb"))
        .join(nf.select(col("tok").as("tok_a"), col("nd").as("na")), Seq("tok_a"))
        .join(nf.select(col("tok").as("tok_b"), col("nd").as("nb")), Seq("tok_b"))
        .crossJoin(nDocs)
        .select(col("tok_a"), col("tok_b"), col("n_ab"),
          round(log2(col("n_ab").cast("double") * col("n_docs") / (col("na") * col("nb"))), 4)
            .as("pmi"))
        .orderBy(col("n_ab").desc, col("tok_a").asc, col("tok_b").asc)
        .limit(20)
    }),

    // Unigram LM scoring: corpus token counts (shared memoized frame) →
    // add-1 smoothed log-probs; each doc's tokens join the |vocab|-sized
    // count table (AQE broadcasts it when it fits) and average their
    // log-probs — one map-side join + one doc-keyed aggregate. High
    // perplexity = "does not look like this corpus" — the cheap filter
    // rung before model-based scoring.
    "q_unigram_lm" -> ((s, dir) => {
      val tc = Extensions4.tokenCounts(s, dir)
      val scal = tc.agg(sum(col("true_n")).as("n_total"), count(lit(1)).as("v_size"))
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
        .join(tc, Seq("tok"))
        .crossJoin(scal)
        .select(col("doc_id"),
          (log2((col("true_n") + 1).cast("double")) -
            log2((col("n_total") + col("v_size")).cast("double"))).as("lp"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), avg(col("lp")).as("alp"))
        .select(col("doc_id"), col("n_tokens"),
          round(col("alp"), 4).as("avg_logp"),
          round(pow(lit(2.0), -col("alp")), 4).as("ppl"))
        .orderBy(col("doc_id").asc)
    }),

    // Near-dup cluster authority: 3 PageRank iterations over the shared
    // verified-pairs graph. The oracle restates the full power iteration
    // from the same nestable pair CTE, so graph and parameters cannot
    // drift from the other graph queries.
    "q_pagerank" -> ((s, dir) =>
      pagerank(Extensions.verifiedPairs(s, dir), PrIters)
        .select(col("node").as("doc_id"), round(col("pr"), 6).as("pagerank"))
        .orderBy(col("doc_id").asc)))

  private def sqlPrIter(prev: String): String =
    s"""SELECT d.node, d.deg,
       |  $Teleport / (SELECT nn FROM n) + $Damping * coalesce(s.acc, 0.0) AS pr
       |FROM d LEFT JOIN (
       |  SELECT e.dst, sum(r.pr / r.deg) AS acc
       |  FROM e JOIN $prev r ON e.src = r.node GROUP BY e.dst) s
       |ON d.node = s.dst""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_token_entropy" ->
      s"""WITH dt AS (
         |  SELECT doc_id, unnest(${Extensions.sqlTokens("text")}) AS tok
         |  FROM documents),
         |pc AS (SELECT doc_id, tok, count(*) AS c FROM dt GROUP BY 1, 2),
         |ag AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    sum(c * log2(c::DOUBLE)) AS clc
         |  FROM pc GROUP BY doc_id)
         |SELECT doc_id, n_tokens,
         |  round(log2(n_tokens::DOUBLE) - clc / n_tokens, 4) AS h_bits
         |FROM ag ORDER BY doc_id""".stripMargin,

    "q_pmi_cooccur" ->
      s"""WITH tc AS (
         |  SELECT tok, count(*) AS c FROM (
         |    SELECT unnest(${Extensions.sqlTokens("text")}) AS tok FROM documents)
         |  GROUP BY tok),
         |top AS (SELECT tok FROM tc ORDER BY c DESC, tok LIMIT $PmiVocab),
         |dt AS (
         |  SELECT DISTINCT doc_id, tok FROM (
         |    SELECT doc_id, unnest(${Extensions.sqlTokens("text")}) AS tok
         |    FROM documents) JOIN top USING (tok)),
         |nf AS (SELECT tok, count(*) AS nd FROM dt GROUP BY tok),
         |pr AS (
         |  SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_ab
         |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
         |  GROUP BY 1, 2),
         |d AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT p.tok_a, p.tok_b, p.n_ab,
         |  round(log2(CAST(p.n_ab * d.n_docs AS DOUBLE) / (na.nd * nb.nd)), 4) AS pmi
         |FROM pr p
         |JOIN nf na ON na.tok = p.tok_a
         |JOIN nf nb ON nb.tok = p.tok_b, d
         |ORDER BY p.n_ab DESC, p.tok_a, p.tok_b LIMIT 20""".stripMargin,

    "q_unigram_lm" ->
      s"""WITH tc AS (
         |  SELECT tok, count(*) AS c FROM (
         |    SELECT unnest(${Extensions.sqlTokens("text")}) AS tok FROM documents)
         |  GROUP BY tok),
         |s AS (SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS v_size FROM tc),
         |dt AS (
         |  SELECT doc_id, unnest(${Extensions.sqlTokens("text")}) AS tok
         |  FROM documents),
         |lp AS (
         |  SELECT d.doc_id,
         |    log2((tc.c + 1)::DOUBLE) - log2((s.n_total + s.v_size)::DOUBLE) AS lp
         |  FROM dt d JOIN tc USING (tok) CROSS JOIN s),
         |ag AS (SELECT doc_id, count(*) AS n_tokens, avg(lp) AS alp FROM lp GROUP BY doc_id)
         |SELECT doc_id, n_tokens, round(alp, 4) AS avg_logp,
         |  round(power(2.0, -alp), 4) AS ppl
         |FROM ag ORDER BY doc_id""".stripMargin,

    "q_pagerank" ->
      s"""WITH pairs AS (${Extensions.minhashPairsSql}),
         |e AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |d AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
         |n AS (SELECT count(*) AS nn FROM d),
         |r0 AS (SELECT node, deg, 1.0 / (SELECT nn FROM n) AS pr FROM d),
         |r1 AS (${sqlPrIter("r0")}),
         |r2 AS (${sqlPrIter("r1")}),
         |r3 AS (${sqlPrIter("r2")})
         |SELECT node AS doc_id, round(pr, 6) AS pagerank
         |FROM r3 ORDER BY doc_id""".stripMargin)
}
