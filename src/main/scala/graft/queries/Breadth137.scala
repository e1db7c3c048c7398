package graft.queries

import graft.Tables
import graft.sim.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hundred-thirty-eighth wave — **q_power_iter**: the dominant
  * right-singular direction of the (1e-6-quantized, uncentered)
  * embedding matrix by eight unrolled power iterations — the PCA
  * primitive of the embedding tier (whitening, drift detection,
  * "is this corpus one-directional" diagnostics all start here).
  *
  * Exact-parity construction: coordinates quantize to integers once
  * (xq = floor(x·1e6 + 0.5), exact on both engines); each iteration
  * computes the per-row projection d_r = Σ_i xq_i·v_i as the SAME
  * fixed-order 64-term double fold both engines share
  * (zip_with/aggregate ↔ list_dot_product), quantizes each per-row
  * per-coordinate contribution floor(xq_i·d_r + 0.5) to int64, and
  * cross-row sums INTEGERS (order-free — the float-mean parity
  * discipline, applied to a matrix-vector product), then renormalizes
  * v ← s / max|s| with one identical double division per coordinate.
  * The all-ones seed makes the sign deterministic.
  *
  * Int64 headroom: |d_r| ≤ 64·|xq|·|v| ≤ 64·10⁷·1 (|x| < 10 in this
  * corpus), so a contribution is ≤ 10⁷·6.4·10⁸ ≈ 6.4·10¹⁵ and the
  * cross-row sum wraps past ~1.4·10³ such worst-case rows — in
  * practice |x| ≤ 1-ish embeddings keep contributions ≤ 10¹¹ with
  * ~9·10⁷-row headroom; past that, rescale v to max|v| = 10⁻³ (the
  * documented knob) before quantizing.
  *
  * Scale shape: per iteration ONE map pass over the corpus (broadcast
  * 64-double v, no shuffle for the projection) + a 64-group integer
  * aggregate with map-side partials + a 64-row renormalize — textbook
  * distributed power iteration; iterations are lazily unrolled with a
  * localCheckpoint each (the HITS lineage discipline). The oracle
  * replays the recursion as a recursive CTE carrying v as a
  * DOUBLE[64] list (the DuckDB seed/MATERIALIZED traps from q_kcenter
  * apply and are avoided). */
object Breadth137 {

  private[graft] val PowerIters = 8
  private[graft] val Dim = 64

  private[graft] def powerIteration(emb: DataFrame,
                                    iters: Int = PowerIters): DataFrame = {
    val xq = emb.select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(1.0e6) + lit(0.5))).as("__xq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var v: DataFrame = emb.sparkSession.range(1)
      .select(transform(sequence(lit(1), lit(Dim)), _ => lit(1.0)).as("__v"))
    (1 to iters).foreach { _ =>
      val sums = xq.crossJoin(broadcast(v))
        .withColumn("__d", Similarity.dot(col("__xq"), col("__v")))
        .select(posexplode(col("__xq")).as(Seq("__p0", "__x")), col("__d"))
        .select((col("__p0") + 1).as("pos"),
          floor(col("__x") * col("__d") + lit(0.5)).cast("long").as("__t"))
        .groupBy(col("pos")).agg(sum(col("__t")).as("__s"))
      v = sums
        .agg(max(abs(col("__s"))).as("__m"),
          array_sort(collect_list(struct(col("pos"), col("__s")))).as("__ps"))
        .select(transform(col("__ps"),
          s => s.getField("__s").cast("double") / col("__m").cast("double"))
          .as("__v"))
        .localCheckpoint(eager = false)
    }
    v.select(posexplode(col("__v")).as(Seq("__p0", "loading")))
      .select((col("__p0") + 1).cast("long").as("pos"), col("loading"))
      .orderBy(col("pos").asc)
  }

  private[graft] val OutlierTopN = 10

  /** The screen the direction exists FOR: the topN vectors most
    * ORTHOGONAL to the dominant direction (smallest |cos| — residual
    * share 1 − cos² is maximal), i.e. the rows PCA explains worst: the
    * outlier/diversity candidates of the embedding tier. Cosines run
    * on the same quantized coordinates as the iteration, rounded 6 dp
    * (the cross-engine rank discipline), ties by vec_id. */
  private[graft] def pcaOutliers(emb: DataFrame,
                                 topN: Int = OutlierTopN): DataFrame = {
    val v = powerIteration(emb)
      .agg(array_sort(collect_list(struct(col("pos"), col("loading"))))
        .as("__pl"))
      .select(transform(col("__pl"), s => s.getField("loading")).as("__v"))
    // Spark floor() yields LONG; the codegen cosine wants float/double
    // elements (values identical — floor output is integer-exact)
    val xq = emb.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(1.0e6) + lit(0.5))
          .cast("double")).as("__xq"))
    val scored = xq.crossJoin(broadcast(v))
      .withColumn("cos_pc1",
        round(Similarity.cosine(col("__xq"), col("__v")), 6))
      .select(col("vec_id"), col("cos_pc1"))
      .orderBy(abs(col("cos_pc1")).asc, col("vec_id").asc)
      .limit(topN)
    scored.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(abs(col("cos_pc1")).asc, col("vec_id").asc)).cast("long"))
      .select(col("rank"), col("vec_id"), col("cos_pc1"))
      .orderBy(col("rank").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_power_iter" -> ((s, dir) =>
      powerIteration(Tables.embeddings(s, dir))),
    "q_pca_outlier" -> ((s, dir) =>
      pcaOutliers(Tables.embeddings(s, dir))))

  /** The quantize + power-iteration CTE chain (no leading WITH),
    * shared by both oracles so the direction cannot drift. */
  private val PowerSql: String =
    s"""ev AS (
       |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> floor(x * 1000000.0 + 0.5)) AS xv
       |  FROM embeddings),
       |eu AS (
       |  SELECT vec_id, unnest(range(1, ${Dim + 1})) AS pos,
       |    unnest(xv) AS xq
       |  FROM ev),
       |r AS (
       |  -- seed from a FROM-clause row (the q_kcenter DuckDB trap:
       |  -- select-list subqueries in a recursive seed go NULL)
       |  SELECT 0 AS it,
       |    list_transform(range(1, ${Dim + 1}),
       |      i -> CAST(1.0 AS DOUBLE)) AS vec
       |  UNION ALL
       |  SELECT it + 1,
       |    (SELECT list(CAST(t.sq AS DOUBLE) /
       |       (SELECT CAST(max(abs(t2.sq)) AS DOUBLE)
       |        FROM (SELECT sum(CAST(floor(eu2.xq
       |                * list_dot_product(ev2.xv, s.vec) + 0.5)
       |                AS BIGINT)) AS sq
       |              FROM eu eu2 JOIN ev ev2 USING (vec_id)
       |              GROUP BY eu2.pos) t2)
       |       ORDER BY t.pos)
       |     FROM (SELECT eu.pos AS pos,
       |             sum(CAST(floor(eu.xq
       |               * list_dot_product(ev.xv, s.vec) + 0.5)
       |               AS BIGINT)) AS sq
       |           FROM eu JOIN ev USING (vec_id)
       |           GROUP BY eu.pos) t)
       |  FROM r s WHERE s.it < $PowerIters)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_power_iter" ->
      s"""WITH RECURSIVE $PowerSql
         |SELECT CAST(u.pos AS BIGINT) AS pos, u.loading
         |FROM (
         |  SELECT unnest(range(1, ${Dim + 1})) AS pos,
         |    unnest(vec) AS loading
         |  FROM r WHERE it = $PowerIters) u
         |ORDER BY pos""".stripMargin,

    "q_pca_outlier" ->
      s"""WITH RECURSIVE $PowerSql,
         |co AS (
         |  SELECT ev.vec_id,
         |    round(list_dot_product(ev.xv, d.vec)
         |      / (sqrt(list_dot_product(ev.xv, ev.xv))
         |        * sqrt(list_dot_product(d.vec, d.vec))), 6) AS cos_pc1
         |  FROM ev, (SELECT vec FROM r WHERE it = $PowerIters) d)
         |SELECT CAST(row_number() OVER (
         |    ORDER BY abs(cos_pc1), vec_id) AS BIGINT) AS rank,
         |  vec_id, cos_pc1
         |FROM co
         |ORDER BY abs(cos_pc1), vec_id
         |LIMIT $OutlierTopN""".stripMargin)
}
