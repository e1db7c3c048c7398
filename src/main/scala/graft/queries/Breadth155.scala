package graft.queries

import graft.Tables
import graft.sim.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-fifty-sixth wave — the PERCOLATION CURVE of the embedding
  * similarity graph: edge/node/degree statistics of the label-blind
  * cosine graph at a sweep of thresholds (0.30 / 0.35 / 0.40 / 0.45
  * — bracketing the house CosThreshold = 0.35 where THIS corpus's
  * near-dup mass lives; an embedding model with a tighter cone shifts
  * the sweep, not the query)
  * — the tuning table for a semantic-dedup cutoff. Lower τ and the
  * graph percolates (a giant near-dup cluster eats the corpus);
  * higher τ and real duplicates escape. The curve shows where this
  * corpus sits, and q_degree_hubs names the vectors that would become
  * cluster centers first (hub safety check before union-find) at
  * τ = 0.40.
  *
  * Exact-parity discipline: cosines are the 6-dp-rounded shared fold;
  * thresshold constants are plain double literals identical in both
  * engines; every emitted statistic is a count / max / one division.
  *
  * Scale shape: the gate-SF build enumerates a<b pairs once and feeds
  * ONE conditional aggregate for all four thresholds (no per-τ
  * rescan); per-node degrees reuse the same pair pass exploded to
  * endpoints. At 100 TB the pair enumeration swaps to the sign-LSH
  * prefilter (Similarity.cosineNearDupPairs' shape, with the table
  * count sized for the swept τ) or the IVF cell join; the sweep
  * aggregate is unchanged. The quadratic form here is the ORACLE'S
  * definition, never the production path.
  */
object Breadth155 {

  private[graft] val Thresholds = Seq(0.30, 0.35, 0.40, 0.45)
  private[graft] val HubTau = 0.40
  private[graft] val HubTopN = 10

  /** All a<b global cosine pairs (6 dp). */
  private[graft] def cosPairs(emb: DataFrame): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"),
      col("embedding").as("__va"))
    val b = emb.select(col("vec_id").as("id_b"),
      col("embedding").as("__vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Similarity.cosine(col("__va"), col("__vb")), 6).as("cos"))
  }

  /** The threshold sweep: one row per τ. */
  private[graft] def percolation(emb: DataFrame): DataFrame = {
    val pairs = cosPairs(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.agg(count(lit(1)).as("__n"))
    val ends = pairs.select(col("id_a").as("node"), col("cos"))
      .unionAll(pairs.select(col("id_b").as("node"), col("cos")))
    val rows = Thresholds.map { t =>
      val deg = ends.filter(col("cos") >= t)
        .groupBy(col("node")).agg(count(lit(1)).as("__d"))
      deg.agg(
          coalesce(sum(col("__d")), lit(0L)).as("__dsum"),
          count(lit(1)).as("n_nodes"),
          coalesce(max(col("__d")), lit(0L)).as("max_degree"))
        .crossJoin(broadcast(n))
        .select(lit(t).as("threshold"),
          expr("__dsum div 2").as("n_edges"),
          col("n_nodes"), col("max_degree"),
          (col("__dsum").cast("double") / col("__n").cast("double"))
            .as("avg_degree"))
    }
    rows.reduce(_ unionAll _).orderBy(col("threshold").asc)
  }

  /** The τ = HubTau hub table: top-10 nodes by degree (ties id-asc). */
  private[graft] def degreeHubs(emb: DataFrame): DataFrame = {
    val pairs = cosPairs(emb)
    val deg = pairs.select(col("id_a").as("node"), col("cos"))
      .unionAll(pairs.select(col("id_b").as("node"), col("cos")))
      .filter(col("cos") >= HubTau)
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      .orderBy(col("degree").desc, col("node").asc)
      .limit(HubTopN)
    deg.withColumn("rank", row_number().over(
        Window.orderBy(col("degree").desc, col("node").asc)).cast("long"))
      .select(col("rank"), col("node"), col("degree"))
      .orderBy(col("rank").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_percolation" -> ((s, dir) =>
      percolation(Tables.embeddings(s, dir))),
    "q_degree_hubs" -> ((s, dir) =>
      degreeHubs(Tables.embeddings(s, dir))))

  /** Pair + endpoint CTE chain (no leading WITH), shared. */
  private val PairSql: String =
    s"""ev AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    round(list_dot_product(a.v, b.v)
       |      / (sqrt(list_dot_product(a.v, a.v))
       |        * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
       |  FROM ev a JOIN ev b ON a.vec_id < b.vec_id),
       |ends AS (
       |  SELECT id_a AS node, cos FROM pairs
       |  UNION ALL SELECT id_b AS node, cos FROM pairs)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_percolation" -> {
      val rows = Thresholds.map { t =>
        s"""SELECT CAST($t AS DOUBLE) AS threshold,
           |  CAST(coalesce(sum(d), 0) // 2 AS BIGINT) AS n_edges,
           |  CAST(count(*) AS BIGINT) AS n_nodes,
           |  CAST(coalesce(max(d), 0) AS BIGINT) AS max_degree,
           |  CAST(coalesce(sum(d), 0) AS DOUBLE)
           |    / (SELECT CAST(count(*) AS DOUBLE) FROM embeddings)
           |    AS avg_degree
           |FROM (SELECT node, CAST(count(*) AS BIGINT) AS d
           |      FROM ends WHERE cos >= $t GROUP BY node) dg"""
          .stripMargin
      }.mkString("\n|UNION ALL\n|")
      s"""WITH $PairSql
         |$rows
         |ORDER BY threshold""".stripMargin
    },

    "q_degree_hubs" ->
      s"""WITH $PairSql,
         |dg AS (
         |  SELECT node, CAST(count(*) AS BIGINT) AS degree
         |  FROM ends WHERE cos >= $HubTau GROUP BY node)
         |SELECT CAST(row_number() OVER (
         |    ORDER BY degree DESC, node) AS BIGINT) AS rank,
         |  node, degree
         |FROM dg
         |ORDER BY degree DESC, node
         |LIMIT $HubTopN""".stripMargin)
}
