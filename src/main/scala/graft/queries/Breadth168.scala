package graft.queries

import graft.Tables
import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-sixty-ninth wave — two ROBUST-COMPARISON estimators:
  *
  *  - **q_js_divergence**: per-source Jensen–Shannon divergence
  *    between the source's unigram distribution and the REST of the
  *    corpus — the symmetric, bounded ([0, ln 2]) drift measure used
  *    to rank which feed diverged. KL (q_kl_source) explodes on
  *    disjoint support; JSD is what you alert on. Absent-token terms
  *    contribute exactly 0 on the absent side and ln 2 weight on the
  *    present side — no smoothing needed.
  *  - **q_median_of_means**: the median-of-16-group-means estimator of
  *    mean line revenue (cents) next to the plain mean — the
  *    heavy-tail-robust estimator a pipeline uses when one corrupt
  *    shard can poison a plain average. Groups are md5-deterministic.
  *
  * Exact-parity discipline: JSD log arguments are ONE division of
  * exact integer products (2·c·n_r over c·n_r + r·n_s ≤ ~5e10 at
  * sf0.1; int64 headroom to ~10⁹-token sources), rounded 6 dp (libm
  * rule), then per-token terms quantized to integer 1e-6 units before
  * the order-free BIGINT sums — one double division per side at emit.
  * Group means are exact cent-sum divisions; the median of an even
  * group count averages the two middle order statistics — a single
  * commutative double addition.
  *
  * Scale shape: JSD is two hash aggregates (token×source, token
  * totals) and a broadcast of per-source totals — the token shuffle is
  * the only corpus-scale exchange; median-of-means is one md5 map +
  * one 16-group aggregate + a 16-row sort. Nothing quadratic.
  */
object Breadth168 {

  private[graft] val MomGroups = 16

  /** Per-source JSD vs the rest of the corpus. */
  private[graft] def jsDivergence(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"),
      explode(Text.tokens(col("text"))).as("tok"))
    val cell = toks.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("__c"))
    val tokTot = cell.groupBy(col("tok")).agg(sum(col("__c")).as("__t"))
      .select(col("tok").as("__tok2"), col("__t"))
    val srcTot = cell.groupBy(col("source")).agg(sum(col("__c")).as("__ns"))
      .select(col("source").as("__src2"), col("__ns"))
    val n = toks.agg(count(lit(1)).as("__n"))
    val j = cell
      .join(broadcast(tokTot), col("tok") === col("__tok2"))
      .join(broadcast(srcTot), col("source") === col("__src2"))
      .crossJoin(broadcast(n))
      .withColumn("__r", col("__t") - col("__c"))
      .withColumn("__nr", col("__n") - col("__ns"))
      .withColumn("__den",
        col("__c") * col("__nr") + col("__r") * col("__ns"))
    // p-side term: c * ln(2*c*nr / den); q-side: r * ln(2*r*ns / den)
    val tp = when(col("__c") === 0, lit(0L)).otherwise(
      floor(col("__c") *
        round(log((lit(2L) * col("__c") * col("__nr")).cast("double") /
          col("__den").cast("double")), 6) * lit(1.0e6) + lit(0.5))
        .cast("long"))
    val tq = when(col("__r") === 0, lit(0L)).otherwise(
      floor(col("__r") *
        round(log((lit(2L) * col("__r") * col("__ns")).cast("double") /
          col("__den").cast("double")), 6) * lit(1.0e6) + lit(0.5))
        .cast("long"))
    j.groupBy(col("source"))
      .agg(first(col("__ns")).as("n_tokens_src"),
        first(col("__nr")).as("__nr"),
        sum(tp).as("__sp"), sum(tq).as("__sq"),
        sum(col("__r")).as("__rsum"))
      // tokens ABSENT from the source carry q-side mass r·ln2 each;
      // their total (nr − Σ_present r) enters as ONE closed-form
      // quantized term (documented semantics, mirrored in the oracle)
      .withColumn("__sqa",
        col("__sq") + floor((col("__nr") - col("__rsum")).cast("double") *
          round(log(lit(2.0)), 6) * lit(1.0e6) + lit(0.5)).cast("long"))
      .select(col("source"), col("n_tokens_src"),
        (lit(0.5) * (col("__sp").cast("double") /
          (col("n_tokens_src") * lit(1000000L)).cast("double") +
          col("__sqa").cast("double") /
            (col("__nr") * lit(1000000L)).cast("double"))).as("jsd_nats"))
      .orderBy(col("source").asc)
  }

  /** Median-of-means vs the plain mean for line revenue (cents). */
  private[graft] def medianOfMeans(lineitem: DataFrame): DataFrame = {
    val tagged = lineitem.select(
      pmod(conv(substring(md5(concat(lit("mom#"),
        col("l_orderkey").cast("string"), lit("#"),
        col("l_linenumber").cast("string"))), 1, 15), 16, 10)
        .cast("long"), lit(MomGroups.toLong)).as("__g"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("__cents"))
    val per = tagged.groupBy(col("__g"))
      .agg(count(lit(1)).as("__cnt"), sum(col("__cents")).as("__s"))
      .withColumn("__m",
        col("__s").cast("double") / col("__cnt").cast("double"))
    val w = Window.orderBy(col("__m").asc, col("__g").asc)
    val ranked = per.withColumn("__rn", row_number().over(w))
    val lo = MomGroups / 2
    val hi = lo + 1
    val tot = tagged.agg(count(lit(1)).as("n"), sum(col("__cents")).as("__t"))
    ranked
      .agg(count(lit(1)).as("g"),
        (sum(when(col("__rn") === lo || col("__rn") === hi, col("__m")))
          / lit(2.0)).as("mom_cents"))
      .crossJoin(broadcast(tot))
      .select(col("n"), col("g"), col("mom_cents"),
        (col("__t").cast("double") / col("n").cast("double"))
          .as("mean_cents"))
  }

  val defs: Map[String, Q] = Map(
    "q_js_divergence" -> ((s, dir) => jsDivergence(Tables.documents(s, dir))),
    "q_median_of_means" -> ((s, dir) =>
      medianOfMeans(Tables.lineitem(s, dir))))

  val oracle: Map[String, String] = Map(
    "q_js_divergence" ->
      s"""WITH toks AS (
         |  SELECT source, unnest(${Extensions.sqlTokens("text")}) AS tok
         |  FROM documents),
         |cell AS (
         |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
         |  FROM toks GROUP BY source, tok),
         |tt AS (SELECT tok, CAST(sum(c) AS BIGINT) AS t
         |  FROM cell GROUP BY tok),
         |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns
         |  FROM cell GROUP BY source),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
         |terms AS (
         |  SELECT cell.source, st.ns, nn.n - st.ns AS nr,
         |    CASE WHEN cell.c = 0 THEN CAST(0 AS BIGINT)
         |      ELSE CAST(floor(cell.c * round(ln(
         |        CAST(2 * cell.c * (nn.n - st.ns) AS DOUBLE)
         |        / CAST(cell.c * (nn.n - st.ns)
         |          + (tt.t - cell.c) * st.ns AS DOUBLE)), 6)
         |        * 1.0e6 + 0.5) AS BIGINT) END AS tp,
         |    CASE WHEN tt.t - cell.c = 0 THEN CAST(0 AS BIGINT)
         |      ELSE CAST(floor((tt.t - cell.c) * round(ln(
         |        CAST(2 * (tt.t - cell.c) * st.ns AS DOUBLE)
         |        / CAST(cell.c * (nn.n - st.ns)
         |          + (tt.t - cell.c) * st.ns AS DOUBLE)), 6)
         |        * 1.0e6 + 0.5) AS BIGINT) END AS tq,
         |    tt.t - cell.c AS r
         |  FROM cell JOIN tt ON cell.tok = tt.tok
         |  JOIN st ON cell.source = st.source
         |  CROSS JOIN nn)
         |SELECT source, ns AS n_tokens_src,
         |  0.5 * (CAST(sum(tp) AS DOUBLE)
         |      / CAST(ns * 1000000 AS DOUBLE)
         |    + CAST(sum(tq) + CAST(floor(CAST(nr - sum(r) AS DOUBLE)
         |        * round(ln(2.0), 6) * 1.0e6 + 0.5) AS BIGINT) AS DOUBLE)
         |      / CAST(nr * 1000000 AS DOUBLE)) AS jsd_nats
         |FROM terms
         |GROUP BY source, ns, nr
         |ORDER BY source""".stripMargin,

    "q_median_of_means" ->
      s"""WITH tagged AS (
         |  SELECT ('0x' || substr(md5('mom#' || CAST(l_orderkey AS VARCHAR)
         |      || '#' || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT
         |      % $MomGroups AS g,
         |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
         |  FROM lineitem),
         |per AS (
         |  SELECT g, CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(sum(cents) AS BIGINT) AS s,
         |    CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m
         |  FROM tagged GROUP BY g),
         |ranked AS (
         |  SELECT m, row_number() OVER (ORDER BY m, g) AS rn FROM per),
         |tot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(cents) AS BIGINT) AS t FROM tagged)
         |SELECT tot.n AS n, CAST(count(*) AS BIGINT) AS g,
         |  sum(CASE WHEN rn = ${MomGroups / 2} OR rn = ${MomGroups / 2 + 1}
         |    THEN m END) / 2.0 AS mom_cents,
         |  CAST(tot.t AS DOUBLE) / CAST(tot.n AS DOUBLE) AS mean_cents
         |FROM ranked CROSS JOIN tot
         |GROUP BY tot.n, tot.t""".stripMargin)
}
