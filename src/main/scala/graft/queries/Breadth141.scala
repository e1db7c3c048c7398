package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hundred-forty-second wave — modularity of the label partition over
  * the GLOBAL mutual-kNN graph: the standard "are these cluster labels
  * real" audit of an embedding clustering. Unlike the within-label
  * graph tier (Breadth43/101, whose edges never cross labels by
  * construction), the graph here is label-BLIND: every vector ranks
  * its top-k neighbours over the whole corpus (exact, via the
  * metric-pruned IVF path with one global block), edges kept only
  * where both endpoints rank each other (mutual), and the label
  * partition is then scored by Newman modularity
  *   Q = Σ_c [ e_c/m − (d_c/2m)² ].
  *
  * Exact-parity discipline: Q is computed as ONE integer-rational —
  * Q = Σ_c (4·m·e_c − d_c²) / (4m²) — the numerator is an order-free
  * INTEGER sum over labels (no per-label double quantization at all),
  * the denominator one identical double division. Int64 headroom:
  * d_c² ≤ 4m² wraps past m ≈ 1.5e9 mutual edges — at that scale sum
  * per-label numerators in Decimal(38,0) (the documented knob).
  * Cosines round to 6 dp with id-ascending tie-break (the Breadth43
  * convention), so the directed edge set is bit-deterministic and the
  * oracle's all-pairs definition reproduces it exactly.
  *
  * Scale shape: the graph build is the IVF exact-kNN (Θ(n^1.5/√cells)
  * with triangle-inequality cell pruning — the Breadth43 scale path,
  * recall 1.0 by construction); the mutual filter is one left-semi
  * self-join on (src,dst) — shuffle on the edge key, never on pairs;
  * modularity itself is two hash aggregates over the edge list plus a
  * broadcast of the |labels|-row degree table. No quadratic path.
  */
object Breadth141 {

  private[graft] val GlobalKnnK = 4

  /** Label-blind directed exact top-k (cos DESC 6dp, id ASC ties). */
  private[graft] def globalKnnDirected(emb: DataFrame,
                                       k: Int = GlobalKnnK): DataFrame = {
    val one = emb.withColumn("__blk", lit(0))
    val n = emb.agg(count(lit(1))).head().getLong(0)
    graft.sim.Ivf.exactKnnDirected(one, k,
      graft.sim.Ivf.adaptiveCells(n, 1L), blockCol = "__blk")
  }

  /** Mutual undirected edges of the global kNN graph. */
  private[graft] def globalMutualEdges(emb: DataFrame,
                                       k: Int = GlobalKnnK): DataFrame =
    Breadth101.mutualFromDirected(globalKnnDirected(emb, k))

  /** Per-label cohesion table over an undirected (id_a, id_b) edge
    * set: nodes, internal edges, total degree, internal fraction,
    * expected fraction under the configuration model, and the label's
    * modularity contribution. */
  private[graft] def labelCohesion(emb: DataFrame,
                                   edges: DataFrame): DataFrame = {
    val lab = emb.select(col("vec_id"), col("label").cast("long").as("label"))
    val ends = edges
      .join(lab.select(col("vec_id").as("id_a"), col("label").as("__la")),
        Seq("id_a"))
      .join(lab.select(col("vec_id").as("id_b"), col("label").as("__lb")),
        Seq("id_b"))
    val m = ends.agg(count(lit(1)).as("__m"))
    val eIn = ends.filter(col("__la") === col("__lb"))
      .groupBy(col("__la").as("label")).agg(count(lit(1)).as("__ein"))
    val dTot = ends.select(col("__la").as("label"))
      .unionAll(ends.select(col("__lb").as("label")))
      .groupBy(col("label")).agg(count(lit(1)).as("__dtot"))
    val nodes = lab.groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))
    nodes
      .join(eIn, Seq("label"), "left")
      .join(dTot, Seq("label"), "left")
      .crossJoin(broadcast(m))
      .select(col("label"), col("n_nodes"),
        coalesce(col("__ein"), lit(0L)).as("e_in"),
        coalesce(col("__dtot"), lit(0L)).as("d_tot"),
        (coalesce(col("__ein"), lit(0L)).cast("double")
          / col("__m").cast("double")).as("frac_in"),
        ((coalesce(col("__dtot"), lit(0L))
            * coalesce(col("__dtot"), lit(0L))).cast("double")
          / (lit(4L) * col("__m") * col("__m")).cast("double"))
          .as("frac_expected"),
        ((lit(4L) * col("__m") * coalesce(col("__ein"), lit(0L))
            - coalesce(col("__dtot"), lit(0L))
              * coalesce(col("__dtot"), lit(0L))).cast("double")
          / (lit(4L) * col("__m") * col("__m")).cast("double"))
          .as("q_contrib"))
      .orderBy(col("label").asc)
  }

  /** Newman modularity of the label partition (one row: m, Q). */
  private[graft] def modularity(emb: DataFrame,
                                edges: DataFrame): DataFrame = {
    val lab = emb.select(col("vec_id"), col("label").cast("long").as("label"))
    val ends = edges
      .join(lab.select(col("vec_id").as("id_a"), col("label").as("__la")),
        Seq("id_a"))
      .join(lab.select(col("vec_id").as("id_b"), col("label").as("__lb")),
        Seq("id_b"))
    val m = ends.agg(count(lit(1)).as("__m"))
    val eIn = ends.filter(col("__la") === col("__lb"))
      .groupBy(col("__la").as("label")).agg(count(lit(1)).as("__ein"))
    val dTot = ends.select(col("__la").as("label"))
      .unionAll(ends.select(col("__lb").as("label")))
      .groupBy(col("label")).agg(count(lit(1)).as("__dtot"))
    dTot.join(eIn, Seq("label"), "left")
      .crossJoin(broadcast(m))
      .select((lit(4L) * col("__m") * coalesce(col("__ein"), lit(0L))
        - col("__dtot") * col("__dtot")).as("__num"), col("__m"))
      .groupBy(col("__m"))
      .agg(sum(col("__num")).as("__nsum"))
      .select(col("__m").as("m_edges"),
        (col("__nsum").cast("double")
          / (lit(4L) * col("__m") * col("__m")).cast("double"))
          .as("q_modularity"))
  }

  val defs: Map[String, Q] = Map(
    // Both consumers read the memoized shared edge frame
    // (Extensions.globalMutualKnnEdges — benched as
    // chain_global_mutual), so each query's bench line is its marginal
    // aggregate cost, not a private IVF rebuild.
    "q_modularity" -> ((s, dir) =>
      modularity(Tables.embeddings(s, dir),
        Extensions.globalMutualKnnEdges(s, dir))),
    "q_label_cohesion" -> ((s, dir) =>
      labelCohesion(Tables.embeddings(s, dir),
        Extensions.globalMutualKnnEdges(s, dir))))

  /** Global all-pairs mutual-kNN edge CTE chain (no leading WITH) —
    * the oracle twin of the IVF-pruned engine build (exact by
    * construction; the engine path is recall-1.0-pinned against the
    * all-pairs form in KnnExactIvfSpec's global-block case). */
  private val EdgeSql: String =
    s"""ev AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
       |  FROM embeddings),
       |pairs AS (
       |  SELECT a.vec_id AS src, b.vec_id AS dst,
       |    round(list_dot_product(a.v, b.v)
       |      / (sqrt(list_dot_product(a.v, a.v))
       |        * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
       |  FROM ev a JOIN ev b ON a.vec_id <> b.vec_id),
       |topk AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src
       |        ORDER BY cos DESC, dst) AS rn
       |    FROM pairs)
       |  WHERE rn <= $GlobalKnnK),
       |mut AS (
       |  SELECT t.src AS id_a, t.dst AS id_b
       |  FROM topk t JOIN topk r ON t.src = r.dst AND t.dst = r.src
       |  WHERE t.src < t.dst),
       |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label
       |        FROM embeddings),
       |ends AS (
       |  SELECT la.label AS la, lb.label AS lb
       |  FROM mut e
       |  JOIN lab la ON e.id_a = la.vec_id
       |  JOIN lab lb ON e.id_b = lb.vec_id),
       |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ends),
       |ein AS (
       |  SELECT la AS label, CAST(count(*) AS BIGINT) AS e_in
       |  FROM ends WHERE la = lb GROUP BY la),
       |dt AS (
       |  SELECT label, CAST(count(*) AS BIGINT) AS d_tot
       |  FROM (SELECT la AS label FROM ends
       |        UNION ALL SELECT lb AS label FROM ends)
       |  GROUP BY label)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_modularity" ->
      s"""WITH $EdgeSql
         |SELECT mm.m AS m_edges,
         |  CAST(sum(4 * mm.m * coalesce(ein.e_in, 0)
         |      - dt.d_tot * dt.d_tot) AS DOUBLE)
         |    / CAST(4 * mm.m * mm.m AS DOUBLE) AS q_modularity
         |FROM dt LEFT JOIN ein ON dt.label = ein.label
         |CROSS JOIN mm
         |GROUP BY mm.m""".stripMargin,

    "q_label_cohesion" ->
      s"""WITH $EdgeSql,
         |nn AS (
         |  SELECT label, CAST(count(*) AS BIGINT) AS n_nodes
         |  FROM lab GROUP BY label)
         |SELECT nn.label, nn.n_nodes,
         |  coalesce(ein.e_in, 0) AS e_in,
         |  coalesce(dt.d_tot, 0) AS d_tot,
         |  CAST(coalesce(ein.e_in, 0) AS DOUBLE) / CAST(mm.m AS DOUBLE)
         |    AS frac_in,
         |  CAST(coalesce(dt.d_tot, 0) * coalesce(dt.d_tot, 0) AS DOUBLE)
         |    / CAST(4 * mm.m * mm.m AS DOUBLE) AS frac_expected,
         |  CAST(4 * mm.m * coalesce(ein.e_in, 0)
         |      - coalesce(dt.d_tot, 0) * coalesce(dt.d_tot, 0) AS DOUBLE)
         |    / CAST(4 * mm.m * mm.m AS DOUBLE) AS q_contrib
         |FROM nn
         |LEFT JOIN ein ON nn.label = ein.label
         |LEFT JOIN dt ON nn.label = dt.label
         |CROSS JOIN mm
         |ORDER BY nn.label""".stripMargin)
}
