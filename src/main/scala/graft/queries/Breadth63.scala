package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixty-fourth wave — Zipf's-law fit and ABC revenue classification.
  *
  *  - **q_zipf_slope**: the Zipf rank-frequency exponent of the corpus
  *    — top-`ZipfK` tokens by frequency (fully tie-broken), OLS slope
  *    of ln(freq) on ln(rank). Complements q_vocab_growth (Heaps' law)
  *    on the vocabulary side: a healthy natural-language corpus fits
  *    slope ≈ −1; boilerplate-heavy or synthetic text bends it. The
  *    regression runs on 1e-6-quantized integer ln values (the bigram-
  *    LM discipline): all five OLS sums are exact BIGINTs — order-free
  *    under shuffle — and the slope is ONE division of exact integers;
  *    the fixed K=200 cap bounds every sum inside BIGINT at any corpus
  *    size (ln(n) ≤ 28e6 quantized even at 10^12 tokens).
  *  - **q_abc_class**: ABC inventory classification — parts ranked by
  *    discounted revenue (tenth-cent-quantized, exact), class A = the
  *    head covering 80 % of cumulative revenue, B to 95 %, C the tail;
  *    per class the part count, revenue and share. The operational
  *    cousin of q_pareto_curve's deciles: fixed cumulative cutoffs
  *    instead of fixed population buckets.
  *
  * Scale shape: q_zipf_slope is one token aggregate + a K-row tail;
  * q_abc_class is one partkey aggregate + a rank over |parts| (the
  * small dimension) + a 3-row rollup. */
object Breadth63 {

  private[graft] val ZipfK = 200
  private[graft] val AbcACut = 0.80
  private[graft] val AbcBCut = 0.95

  /** OLS slope/intercept of ln(freq) vs ln(rank) over the top-k
    * tokens, on 1e-6-quantized integer ln values. */
  private[graft] def zipfSlope(docs: DataFrame, k: Int = ZipfK): DataFrame = {
    val byFreq = Window.orderBy(col("n").desc, col("tok").asc)
    val ranked = docs
      .select(explode(graft.text.Text.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(k)
      .withColumn("r", row_number().over(byFreq))
    val q = ranked.select(
      floor(log(col("r").cast("double")) * lit(1000000.0) + lit(0.5))
        .cast("long").as("x"),
      floor(log(col("n").cast("double")) * lit(1000000.0) + lit(0.5))
        .cast("long").as("y"))
    val agg = q.agg(count(lit(1)).as("n_tokens"),
      sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
      sum(col("x") * col("y")).as("__sxy"),
      sum(col("x") * col("x")).as("__sxx"))
    val num = col("n_tokens") * col("__sxy") - col("__sx") * col("__sy")
    val den = col("n_tokens") * col("__sxx") - col("__sx") * col("__sx")
    val slope = num.cast("double") / den.cast("double")
    agg.select(col("n_tokens"), slope.as("slope"),
      (((col("__sy").cast("double") - slope * col("__sx").cast("double")) /
        col("n_tokens").cast("double")) / lit(1000000.0)).as("intercept"))
  }

  /** ABC classification of parts by cumulative discounted-revenue
    * share (exact tenth-cent integers; cutoffs on the exact ratio). */
  private[graft] def abcClass(lineitem: DataFrame): DataFrame = {
    val per = lineitem
      .withColumn("__tc",
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          lit(10000.0) + lit(0.5)).cast("long"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("__tc")).as("__rev"))
    val cum = Window.orderBy(col("__rev").desc, col("l_partkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    val classed = per
      .withColumn("__cum", sum(col("__rev")).over(cum))
      .withColumn("__tot", sum(col("__rev")).over(all))
      .withColumn("__share",
        col("__cum").cast("double") / col("__tot").cast("double"))
      .withColumn("abc_class",
        when(col("__share") <= lit(AbcACut), lit("A"))
          .when(col("__share") <= lit(AbcBCut), lit("B"))
          .otherwise(lit("C")))
    classed
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_parts"), sum(col("__rev")).as("revenue_tc"))
      .withColumn("rev_share",
        col("revenue_tc").cast("double") /
          sum(col("revenue_tc")).over(all).cast("double"))
      .select(col("abc_class"), col("n_parts"), col("revenue_tc"),
        col("rev_share"))
      .orderBy(col("abc_class").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_zipf_slope" -> ((s, dir) => zipfSlope(Tables.documents(s, dir))),
    "q_abc_class" -> ((s, dir) => abcClass(Tables.lineitem(s, dir))))

  val oracle: Map[String, String] = Map(
    "q_zipf_slope" ->
      s"""WITH tf AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS n FROM (
         |    SELECT unnest(regexp_split_to_array(
         |      regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
         |      AS tok
         |    FROM documents)
         |  GROUP BY tok ORDER BY n DESC, tok LIMIT $ZipfK),
         |rk AS (
         |  SELECT n, CAST(row_number() OVER (ORDER BY n DESC, tok)
         |    AS BIGINT) AS r
         |  FROM tf),
         |q AS (
         |  SELECT CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000.0 + 0.5)
         |      AS BIGINT) AS x,
         |    CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000.0 + 0.5)
         |      AS BIGINT) AS y
         |  FROM rk),
         |s AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx
         |  FROM q)
         |SELECT n_tokens,
         |  CAST(n_tokens * sxy - sx * sy AS DOUBLE)
         |    / CAST(n_tokens * sxx - sx * sx AS DOUBLE) AS slope,
         |  ((CAST(sy AS DOUBLE)
         |    - (CAST(n_tokens * sxy - sx * sy AS DOUBLE)
         |       / CAST(n_tokens * sxx - sx * sx AS DOUBLE))
         |      * CAST(sx AS DOUBLE))
         |    / CAST(n_tokens AS DOUBLE)) / 1000000.0 AS intercept
         |FROM s""".stripMargin,

    "q_abc_class" ->
      s"""WITH per AS (
         |  SELECT l_partkey,
         |    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
         |      * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev
         |  FROM lineitem GROUP BY 1),
         |cl AS (
         |  SELECT rev,
         |    CASE
         |      WHEN CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |          AS DOUBLE)
         |        / CAST(sum(rev) OVER () AS DOUBLE) <= $AbcACut THEN 'A'
         |      WHEN CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |          AS DOUBLE)
         |        / CAST(sum(rev) OVER () AS DOUBLE) <= $AbcBCut THEN 'B'
         |      ELSE 'C'
         |    END AS abc_class
         |  FROM per)
         |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
         |  CAST(sum(rev) AS BIGINT) AS revenue_tc,
         |  CAST(sum(rev) AS DOUBLE)
         |    / CAST(sum(sum(rev)) OVER () AS DOUBLE) AS rev_share
         |FROM cl GROUP BY abc_class ORDER BY abc_class""".stripMargin)
}
