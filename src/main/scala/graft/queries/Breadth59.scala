package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixtieth wave — market-basket association mining over the order
  * tables.
  *
  *  - **q_market_basket**: the top-20 part pairs by basket
  *    co-occurrence with the full association-rule panel — support,
  *    both conditional confidences, and lift stated as the
  *    cross-multiplied integer ratio (cnt·N)/(cₐ·c_b), ONE division
  *    per measure (a float p(a)p(b) product would stack three
  *    divisions). The frequent-itemset primitive at k=2 — the A-priori
  *    candidate step every basket-analysis pipeline starts with.
  *  - **q_part_affinity**: each part's strongest associate (rank-picked
  *    by co-count, then lift ordered by the exact integer
  *    cross-product cnt·N·c'ₐ·c'_b comparison — no float sort keys,
  *    ties to the smaller partner id). The "customers also bought"
  *    view.
  *
  * Scale shape: pair enumeration is a within-basket self-join — cost
  * Σ itemsₒ², bounded by the basket-size cap (≤13 here; production
  * caps giant baskets the same way wedge enumeration caps hubs), never
  * |parts|². Everything else is |pairs|-sized aggregation. */
object Breadth59 {

  private[graft] val TopPairs = 20
  private[graft] val MinTogether = 3L

  /** Distinct (order, part) items and the canonical co-occurrence pair
    * counts with per-part basket counts and the basket total —
    * store-backed through the plan-keyed memo (round 14): the pair
    * enumeration is the priciest step of BOTH consumers
    * (q_market_basket, q_part_affinity — ~9 task-s / 80 MB shuffle per
    * run at sf0.1), and at warehouse scale the pair-counts table is the
    * materialized artifact every basket consumer reads. */
  private[graft] def pairTable(lineitem: DataFrame): DataFrame =
    Breadth13.memoizedOnPlan(lineitem, "basket_pairs") {
      pairTablePlan(lineitem)
    }

  /** The raw (un-memoized) pair-table plan — plan pins and the bench's
    * memo-bypassing resamples build it directly. */
  private[graft] def pairTablePlan(lineitem: DataFrame): DataFrame = {
    val items = lineitem.select(col("l_orderkey").as("okey"),
      col("l_partkey").as("part")).distinct()
    val counts = items.groupBy(col("part")).agg(count(lit(1)).as("__cnt"))
    val n = items.agg(countDistinct(col("okey")).as("__n"))
    val a = items.select(col("okey"), col("part").as("part_a"))
    val b = items.select(col("okey"), col("part").as("part_b"))
    a.join(b, Seq("okey")).filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_together"))
      .join(counts.select(col("part").as("part_a"), col("__cnt").as("__ca")),
        "part_a")
      .join(counts.select(col("part").as("part_b"), col("__cnt").as("__cb")),
        "part_b")
      .crossJoin(broadcast(n))
  }

  private[graft] def marketBasket(lineitem: DataFrame): DataFrame =
    pairTable(lineitem)
      .filter(col("n_together") >= MinTogether)
      .select(col("part_a"), col("part_b"), col("n_together"),
        (col("n_together").cast("double") / col("__n").cast("double"))
          .as("support"),
        (col("n_together").cast("double") / col("__ca").cast("double"))
          .as("conf_a_to_b"),
        (col("n_together").cast("double") / col("__cb").cast("double"))
          .as("conf_b_to_a"),
        ((col("n_together") * col("__n")).cast("double") /
          (col("__ca") * col("__cb")).cast("double")).as("lift"))
      .orderBy(col("n_together").desc, col("part_a").asc,
        col("part_b").asc)
      .limit(TopPairs)

  private[graft] def partAffinity(lineitem: DataFrame): DataFrame = {
    val p = pairTable(lineitem)
    val both = p.select(col("part_a").as("part"),
        col("part_b").as("partner"), col("n_together"),
        col("__ca").as("__cp"), col("__cb").as("__cq"), col("__n"))
      .unionAll(p.select(col("part_b").as("part"),
        col("part_a").as("partner"), col("n_together"),
        col("__cb").as("__cp"), col("__ca").as("__cq"), col("__n")))
    // rank by co-count, then the EXACT lift comparison via the integer
    // cross product n_together·N·(c'p·c'q of the rival) — realized here
    // as ordering on (n_together·N, cp·cq) which yields the same order
    // for a fixed part (cp constant): lift ∝ n_together / cq.
    val w = Window.partitionBy(col("part"))
      .orderBy(col("n_together").desc, col("__cq").asc,
        col("partner").asc)
    both.withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("part"), col("partner"), col("n_together"),
        ((col("n_together") * col("__n")).cast("double") /
          (col("__cp") * col("__cq")).cast("double")).as("lift"))
      .orderBy(col("part").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_market_basket" -> ((s, dir) =>
      marketBasket(Tables.lineitem(s, dir))),
    "q_part_affinity" -> ((s, dir) =>
      partAffinity(Tables.lineitem(s, dir))))

  private val pairsSql =
    """it AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS part
      |  FROM lineitem),
      |pc AS (SELECT part, CAST(count(*) AS BIGINT) AS cnt
      |  FROM it GROUP BY part),
      |nn AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n FROM it),
      |pr AS (
      |  SELECT a.part AS part_a, b.part AS part_b,
      |    CAST(count(*) AS BIGINT) AS n_together
      |  FROM it a JOIN it b ON a.okey = b.okey AND a.part < b.part
      |  GROUP BY 1, 2),
      |pj AS (
      |  SELECT pr.part_a, pr.part_b, pr.n_together,
      |    ca.cnt AS ca, cb.cnt AS cb, (SELECT n FROM nn) AS n
      |  FROM pr
      |  JOIN pc ca ON ca.part = pr.part_a
      |  JOIN pc cb ON cb.part = pr.part_b)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_market_basket" ->
      s"""WITH $pairsSql
         |SELECT part_a, part_b, n_together,
         |  CAST(n_together AS DOUBLE) / CAST(n AS DOUBLE) AS support,
         |  CAST(n_together AS DOUBLE) / CAST(ca AS DOUBLE) AS conf_a_to_b,
         |  CAST(n_together AS DOUBLE) / CAST(cb AS DOUBLE) AS conf_b_to_a,
         |  CAST(n_together * n AS DOUBLE) / CAST(ca * cb AS DOUBLE) AS lift
         |FROM pj WHERE n_together >= $MinTogether
         |ORDER BY n_together DESC, part_a, part_b
         |LIMIT $TopPairs""".stripMargin,

    "q_part_affinity" ->
      s"""WITH $pairsSql,
         |bi AS (
         |  SELECT part_a AS part, part_b AS partner, n_together,
         |    ca AS cp, cb AS cq, n
         |  FROM pj
         |  UNION ALL
         |  SELECT part_b, part_a, n_together, cb, ca, n FROM pj),
         |rk AS (
         |  SELECT *, row_number() OVER (PARTITION BY part
         |    ORDER BY n_together DESC, cq, partner) AS r
         |  FROM bi)
         |SELECT part, partner, n_together,
         |  CAST(n_together * n AS DOUBLE) / CAST(cp * cq AS DOUBLE) AS lift
         |FROM rk WHERE r = 1 ORDER BY part""".stripMargin)
}
