package graft.queries

import graft.Tables
import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hundred-seventy-third wave — HILL DIVERSITY NUMBERS, the unified
  * diversity profile ecology lends to corpus QC: ⁰D = richness
  * (type count), ¹D = exp(Shannon entropy) (the "effective vocabulary"
  * under observed skew), ²D = inverse Simpson (effective vocabulary
  * weighted toward the head). A source whose ¹D/⁰D collapses is
  * boilerplate; the three together are the standard diversity
  * spectrum (the repo has entropy and Simpson separately — Hill
  * numbers put them on ONE comparable effective-count scale).
  *
  *  - **q_hill_numbers**: per source — token count, ⁰D, ¹D, ²D.
  *  - **q_source_effective**: one row — the effective number of
  *    SOURCES from the doc-count distribution (¹D and ²D of source
  *    shares): how many feeds the corpus effectively has.
  *
  * Exact-parity discipline: ²D = N²/Σc² is one double division of
  * exact integers (headroom N² at int64 to N ≈ 3e9 tokens/source);
  * ¹D quantizes per-type entropy terms c·ln(c/N) (ln of ONE exact
  * division, rounded 6 dp — the libm rule) to integer 1e-6 units,
  * sums order-free, and the final exp — itself a libm call — is
  * EMIT-rounded to 4 dp on both engines.
  *
  * Scale shape: one token explode + per-(source, token) hash
  * aggregate, then per-source sums — map-side combinable throughout;
  * the source-level query is a 20-row aggregate.
  */
object Breadth172 {

  /** Per-source Hill numbers. */
  private[graft] def hillNumbers(docs: DataFrame): DataFrame = {
    val cnt = docs
      .select(col("source"), explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("__c"))
    val per = cnt.groupBy(col("source"))
      .agg(sum(col("__c")).as("n_tokens"), count(lit(1)).as("hill0"))
      .select(col("source").as("__src2"), col("n_tokens"), col("hill0"))
    val terms = cnt.join(broadcast(per), col("source") === col("__src2"))
      .select(col("source"), col("n_tokens"), col("hill0"),
        floor(col("__c") *
          round(log(col("__c").cast("double") /
            col("n_tokens").cast("double")), 6) * lit(1.0e6) + lit(0.5))
          .cast("long").as("__t"),
        (col("__c") * col("__c")).as("__c2"))
    terms.groupBy(col("source"))
      .agg(first(col("n_tokens")).as("n_tokens"),
        first(col("hill0")).as("hill0"),
        sum(col("__t")).as("__st"), sum(col("__c2")).as("__sc2"))
      .select(col("source"), col("n_tokens"), col("hill0"),
        round(exp((-col("__st")).cast("double") /
          (col("n_tokens") * lit(1000000L)).cast("double")), 4)
          .as("hill1"),
        ((col("n_tokens") * col("n_tokens")).cast("double") /
          col("__sc2").cast("double")).as("hill2"))
      .orderBy(col("source").asc)
  }

  /** Effective number of sources from doc-count shares. */
  private[graft] def sourceEffective(docs: DataFrame): DataFrame = {
    val per = docs.groupBy(col("source")).agg(count(lit(1)).as("__c"))
    val n = per.agg(sum(col("__c")).as("__n"))
    per.crossJoin(broadcast(n))
      .select(
        floor(col("__c") *
          round(log(col("__c").cast("double") / col("__n").cast("double")),
            6) * lit(1.0e6) + lit(0.5)).cast("long").as("__t"),
        (col("__c") * col("__c")).as("__c2"), col("__n"))
      .groupBy(col("__n"))
      .agg(count(lit(1)).as("n_sources"), sum(col("__t")).as("__st"),
        sum(col("__c2")).as("__sc2"))
      .select(col("n_sources"),
        round(exp((-col("__st")).cast("double") /
          (col("__n") * lit(1000000L)).cast("double")), 4)
          .as("eff_shannon"),
        ((col("__n") * col("__n")).cast("double") /
          col("__sc2").cast("double")).as("eff_simpson"))
  }

  val defs: Map[String, Q] = Map(
    "q_hill_numbers" -> ((s, dir) => hillNumbers(Tables.documents(s, dir))),
    "q_source_effective" -> ((s, dir) =>
      sourceEffective(Tables.documents(s, dir))))

  val oracle: Map[String, String] = Map(
    "q_hill_numbers" ->
      s"""WITH toks AS (
         |  SELECT source, unnest(${Extensions.sqlTokens("text")}) AS tok
         |  FROM documents),
         |cnt AS (
         |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
         |  FROM toks GROUP BY source, tok),
         |per AS (
         |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS hill0
         |  FROM cnt GROUP BY source),
         |terms AS (
         |  SELECT cnt.source, per.n_tokens, per.hill0,
         |    CAST(floor(cnt.c * round(ln(CAST(cnt.c AS DOUBLE)
         |      / CAST(per.n_tokens AS DOUBLE)), 6) * 1.0e6 + 0.5)
         |      AS BIGINT) AS t,
         |    cnt.c * cnt.c AS c2
         |  FROM cnt JOIN per ON cnt.source = per.source)
         |SELECT source, n_tokens, hill0,
         |  round(exp(CAST(-sum(t) AS DOUBLE)
         |    / CAST(n_tokens * 1000000 AS DOUBLE)), 4) AS hill1,
         |  CAST(n_tokens * n_tokens AS DOUBLE)
         |    / CAST(sum(c2) AS DOUBLE) AS hill2
         |FROM terms
         |GROUP BY source, n_tokens, hill0
         |ORDER BY source""".stripMargin,

    "q_source_effective" ->
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY source),
        |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM per),
        |terms AS (
        |  SELECT CAST(floor(c * round(ln(CAST(c AS DOUBLE)
        |      / CAST(nn.n AS DOUBLE)), 6) * 1.0e6 + 0.5) AS BIGINT) AS t,
        |    c * c AS c2, nn.n
        |  FROM per CROSS JOIN nn)
        |SELECT CAST(count(*) AS BIGINT) AS n_sources,
        |  round(exp(CAST(-sum(t) AS DOUBLE)
        |    / CAST(n * 1000000 AS DOUBLE)), 4) AS eff_shannon,
        |  CAST(n * n AS DOUBLE) / CAST(sum(c2) AS DOUBLE) AS eff_simpson
        |FROM terms
        |GROUP BY n""".stripMargin)
}
