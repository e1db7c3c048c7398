package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-sixty-fifth wave — BLOCKED rank concordance: do the five
  * order priorities keep the SAME revenue ordering month after month,
  * or does the ranking churn? The repo's k-sample tests (Mann–Whitney,
  * Kruskal–Wallis) compare pooled groups; these are the
  * REPEATED-MEASURES versions, blocking by month so between-month
  * level shifts cancel:
  *
  *  - **q_friedman**: Friedman's χ²_F over blocks = order months,
  *    treatments = the 5 priority classes, cell value = month×priority
  *    revenue (cents), plus Kendall's W (the [0,1] concordance
  *    normalization of the same rank sums). Average ranks for ties,
  *    no tie correction (documented; ties between exact cent sums are
  *    measure-zero).
  *  - **q_friedman_ranks**: the per-treatment rank profile — doubled
  *    rank sums and mean ranks — naming WHICH priority consistently
  *    wins.
  *
  * Exact-parity discipline: cell values are exact cent sums; the
  * within-block average rank is carried DOUBLED (D = 2·minrank +
  * ties − 1, an integer — no half fractions cross the wire); rank
  * sums S′_j = Σ D are BIGINTs, and both statistics are divisions/
  * subtractions of exact integer products:
  * χ²_F = 3·ΣS′² / (n·k·(k+1)) − 3·n·(k+1),
  * W = (3·ΣS′² − 3·n²·k·(k+1)²) / (n²·k·(k²−1)).
  * Incomplete blocks (a month missing a priority) are dropped — the
  * classical complete-block design, mirrored in the oracle. Int64
  * headroom: S′ ≤ 2nk, ΣS′² ≤ 4n²k³ — overflow needs n ≈ 10⁷ months.
  *
  * Scale shape: one hash aggregate to the |months|·k cell grid, rank
  * windows over k-row partitions, then metadata-sized sums — nothing
  * scales with row count past the first aggregate.
  */
object Breadth164 {

  /** Doubled average ranks per complete block (internal). */
  private[graft] def blockRanks(orders: DataFrame): DataFrame = {
    val cells = orders
      .select(date_trunc("month", col("o_orderdate").cast("date"))
          .cast("date").as("m"),
        substring(col("o_orderpriority"), 1, 1).cast("long").as("pri"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("__c"))
      .groupBy(col("m"), col("pri"))
      .agg(sum(col("__c")).as("v"))
    val k = cells.agg(count_distinct(col("pri")).as("__k"))
    val byBlock = Window.partitionBy(col("m"))
    cells
      .withColumn("__cells", count(lit(1)).over(byBlock))
      .crossJoin(broadcast(k))
      .filter(col("__cells") === col("__k")) // complete blocks only
      .withColumn("__r",
        rank().over(byBlock.orderBy(col("v").asc)).cast("long"))
      .withColumn("__t",
        count(lit(1)).over(Window.partitionBy(col("m"), col("v"))))
      .withColumn("d2", lit(2L) * col("__r") + col("__t") - 1)
      .select(col("m"), col("pri"), col("v"), col("d2"), col("__k"))
  }

  /** Per-treatment doubled rank sums (internal). */
  private[graft] def rankSums(orders: DataFrame): DataFrame =
    blockRanks(orders)
      .groupBy(col("pri"))
      .agg(sum(col("d2")).as("rank_sum_2x"), count(lit(1)).as("n_blocks"),
        first(col("__k")).as("__k"))

  /** One-row Friedman χ² + Kendall's W. */
  private[graft] def friedman(orders: DataFrame): DataFrame =
    rankSums(orders)
      .agg(max(col("__k")).as("k"), max(col("n_blocks")).as("n_blocks"),
        sum(col("rank_sum_2x") * col("rank_sum_2x")).as("__ss2"))
      .select(col("n_blocks"), col("k"),
        when(col("k") < 2, lit(null)).otherwise(
          (lit(3L) * col("__ss2")).cast("double") /
            (col("n_blocks") * col("k") * (col("k") + 1)).cast("double") -
            (lit(3L) * col("n_blocks") * (col("k") + 1)).cast("double"))
          .as("chi2_f"),
        when(col("k") < 2, lit(null)).otherwise(
          (lit(3L) * col("__ss2") -
            lit(3L) * col("n_blocks") * col("n_blocks") * col("k") *
              (col("k") + 1) * (col("k") + 1)).cast("double") /
            (col("n_blocks") * col("n_blocks") * col("k") *
              (col("k") * col("k") - 1)).cast("double"))
          .as("kendall_w"))

  /** Per-treatment rank profile. */
  private[graft] def friedmanRanks(orders: DataFrame): DataFrame =
    rankSums(orders)
      .select(col("pri"), col("n_blocks"), col("rank_sum_2x"),
        (col("rank_sum_2x").cast("double") /
          (lit(2L) * col("n_blocks")).cast("double")).as("mean_rank"))
      .orderBy(col("mean_rank").asc, col("pri").asc)

  val defs: Map[String, Q] = Map(
    "q_friedman" -> ((s, dir) => friedman(Tables.orders(s, dir))),
    "q_friedman_ranks" -> ((s, dir) => friedmanRanks(Tables.orders(s, dir))))

  /** Rank-sum CTE chain (no leading WITH), shared. */
  private val RankSql: String =
    """cells AS (
      |  SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE))
      |      AS DATE) AS m,
      |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pri,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS v
      |  FROM orders GROUP BY 1, 2),
      |kk AS (SELECT CAST(count(DISTINCT pri) AS BIGINT) AS k FROM cells),
      |cb AS (
      |  SELECT m FROM cells CROSS JOIN kk
      |  GROUP BY m, kk.k HAVING count(*) = kk.k),
      |rk AS (
      |  SELECT c.m, c.pri,
      |    CAST(2 * rank() OVER (PARTITION BY c.m ORDER BY c.v)
      |      + count(*) OVER (PARTITION BY c.m, c.v) - 1 AS BIGINT) AS d2
      |  FROM cells c JOIN cb ON c.m = cb.m),
      |pt AS (
      |  SELECT pri, CAST(sum(d2) AS BIGINT) AS s,
      |    CAST(count(*) AS BIGINT) AS nb
      |  FROM rk GROUP BY pri)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_friedman" ->
      s"""WITH $RankSql
         |SELECT CAST(max(nb) AS BIGINT) AS n_blocks,
         |  CAST(max(kk.k) AS BIGINT) AS k,
         |  CASE WHEN max(kk.k) < 2 THEN NULL
         |    ELSE CAST(3 * sum(s * s) AS DOUBLE)
         |        / CAST(max(nb) * max(kk.k) * (max(kk.k) + 1) AS DOUBLE)
         |      - CAST(3 * max(nb) * (max(kk.k) + 1) AS DOUBLE) END
         |    AS chi2_f,
         |  CASE WHEN max(kk.k) < 2 THEN NULL
         |    ELSE CAST(3 * sum(s * s) - 3 * max(nb) * max(nb) * max(kk.k)
         |        * (max(kk.k) + 1) * (max(kk.k) + 1) AS DOUBLE)
         |      / CAST(max(nb) * max(nb) * max(kk.k)
         |        * (max(kk.k) * max(kk.k) - 1) AS DOUBLE) END
         |    AS kendall_w
         |FROM pt CROSS JOIN kk""".stripMargin,

    "q_friedman_ranks" ->
      s"""WITH $RankSql
         |SELECT pri, nb AS n_blocks, s AS rank_sum_2x,
         |  CAST(s AS DOUBLE) / CAST(2 * nb AS DOUBLE) AS mean_rank
         |FROM pt
         |ORDER BY mean_rank, pri""".stripMargin)
}
