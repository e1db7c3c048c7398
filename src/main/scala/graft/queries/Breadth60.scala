package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixty-first wave — RFM customer segmentation over the orders table.
  *
  *  - **q_rfm**: per customer — recency (days from last order to the
  *    corpus's latest order date, a broadcast scalar), frequency
  *    (order count) and monetary value (cent-quantized BEFORE the sum,
  *    so the aggregate is an exact BIGINT — summing the raw DOUBLE
  *    prices would be accumulation-order-dependent), each scored into
  *    rank quintiles (bucket = 5·(rank−1) div n, the SAX equi-depth
  *    move — no percentile interpolation) and concatenated into the
  *    classic three-digit RFM segment.
  *  - **q_rfm_summary**: the segment rollup — customer count, total
  *    and mean monetary value (ratio of integer sums) per segment;
  *    the table a retention campaign is sized from.
  *
  * Scale shape: one groupBy(customer) + three rank windows over the
  * |customers|-sized aggregate + a |segments|-sized rollup. */
object Breadth60 {

  private[graft] def rfm(orders: DataFrame): DataFrame = {
    val ref = orders.agg(max(col("o_orderdate").cast("date")).as("__ref"))
    val per = orders
      .withColumn("__cents",
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate").cast("date")).as("__last"),
        count(lit(1)).as("frequency"),
        sum(col("__cents")).as("monetary_cents"))
      .crossJoin(broadcast(ref))
      .withColumn("recency_days", datediff(col("__ref"), col("__last")))
    val n = Window.partitionBy()
    // three rank passes over the |customers|-sized frame (the windows
    // are unpartitioned by design: a global quintile NEEDS a global
    // rank — aggregate-sized input, the q_ks_drift precedent)
    val withN = per.withColumn("__n", count(lit(1)).over(n))
    val r = withN
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("recency_days").asc, col("custkey").asc))
        .cast("long"))
      .withColumn("r_score",
        lit(5) - expr("(5 * (__rk - 1)) div __n").cast("int"))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("frequency").desc, col("custkey").asc))
        .cast("long"))
      .withColumn("f_score",
        lit(5) - expr("(5 * (__rk - 1)) div __n").cast("int"))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("monetary_cents").desc, col("custkey").asc))
        .cast("long"))
      .withColumn("m_score",
        lit(5) - expr("(5 * (__rk - 1)) div __n").cast("int"))
    r.select(col("custkey"), col("recency_days"), col("frequency"),
      (col("monetary_cents").cast("double") / lit(100.0)).as("monetary"),
      col("r_score"), col("f_score"), col("m_score"),
      concat(col("r_score"), col("f_score"), col("m_score")).as("segment"))
      .orderBy(col("custkey").asc)
  }

  private[graft] def rfmSummary(orders: DataFrame): DataFrame =
    rfm(orders)
      .withColumn("__cents",
        floor(col("monetary") * lit(100.0) + lit(0.5)).cast("long"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("__cents")).as("total_monetary_cents"))
      .select(col("segment"), col("n_customers"),
        col("total_monetary_cents"),
        (col("total_monetary_cents").cast("double") /
          (col("n_customers") * lit(100L)).cast("double"))
          .as("avg_monetary"))
      .orderBy(col("segment").asc)

  val defs: Map[String, Q] = Map(
    "q_rfm" -> ((s, dir) => rfm(Tables.orders(s, dir))),
    "q_rfm_summary" -> ((s, dir) => rfmSummary(Tables.orders(s, dir))))

  private val rfmSql =
    """per AS (
      |  SELECT o_custkey AS custkey,
      |    max(CAST(o_orderdate AS DATE)) AS last_day,
      |    CAST(count(*) AS BIGINT) AS frequency,
      |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
      |      AS BIGINT) AS monetary_cents
      |  FROM orders GROUP BY o_custkey),
      |ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS ref_day FROM orders),
      |base AS (
      |  SELECT custkey, datediff('day', last_day, ref_day) AS recency_days,
      |    frequency, monetary_cents,
      |    CAST(count(*) OVER () AS BIGINT) AS n
      |  FROM per CROSS JOIN ref),
      |sc AS (
      |  SELECT *,
      |    5 - CAST((5 * (row_number() OVER (ORDER BY recency_days, custkey)
      |      - 1)) // n AS INTEGER) AS r_score,
      |    5 - CAST((5 * (row_number() OVER (ORDER BY frequency DESC, custkey)
      |      - 1)) // n AS INTEGER) AS f_score,
      |    5 - CAST((5 * (row_number() OVER (ORDER BY monetary_cents DESC,
      |      custkey) - 1)) // n AS INTEGER) AS m_score
      |  FROM base),
      |rfm AS (
      |  SELECT custkey, CAST(recency_days AS INTEGER) AS recency_days,
      |    frequency,
      |    CAST(monetary_cents AS DOUBLE) / 100.0 AS monetary,
      |    r_score, f_score, m_score,
      |    concat(CAST(r_score AS VARCHAR), CAST(f_score AS VARCHAR),
      |      CAST(m_score AS VARCHAR)) AS segment,
      |    monetary_cents
      |  FROM sc)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_rfm" ->
      s"""WITH $rfmSql
         |SELECT custkey, recency_days, frequency, monetary,
         |  r_score, f_score, m_score, segment
         |FROM rfm ORDER BY custkey""".stripMargin,

    "q_rfm_summary" ->
      s"""WITH $rfmSql
         |SELECT segment, CAST(count(*) AS BIGINT) AS n_customers,
         |  CAST(sum(monetary_cents) AS BIGINT) AS total_monetary_cents,
         |  CAST(sum(monetary_cents) AS DOUBLE)
         |    / CAST(count(*) * 100 AS DOUBLE) AS avg_monetary
         |FROM rfm GROUP BY segment ORDER BY segment""".stripMargin)
}
