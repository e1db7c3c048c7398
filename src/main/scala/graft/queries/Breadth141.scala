package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hundred-forty-second wave — modularity of the label partition over
  * the GLOBAL mutual-kNN graph: the standard "are these cluster labels
  * real" audit of an embedding clustering. Unlike the within-label
  * graph tier (Breadth43/101, whose edges never cross labels by
  * construction), the graph here is label-BLIND: every vector ranks
  * its top-k neighbours over the whole corpus (the sub-quadratic
  * projection-window approximate build, graft.sim.ProjGraph — the
  * exact IVF path remains as globalMutualEdgesExact and as
  * q_mutual_recall's reference), edges kept only
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
  * Scale shape: the graph build is the linear projection-window
  * construction (Θ(n·(P·W + k²)·dim), see graft.sim.ProjGraph — the
  * 18.7×-at-10× exact IVF build left the default path in round 13);
  * the mutual filter is one left-semi
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

  /** Mutual undirected edges of the global kNN graph — the DEFAULT
    * build every global-graph consumer reads. Since round 13 this is
    * the sub-quadratic projection-window approximation
    * (graft.sim.ProjGraph): the exact IVF build's Θ(n^1.5) envelope
    * measured 18.7× at 10× data — in-envelope but not scale-safe. The
    * consumer oracles mirror the approximate construction EXACTLY
    * (projMutualCtes below), so correctness never rides on recall;
    * recall itself is audited by q_mutual_recall against brute-force
    * ground truth, with [[globalMutualEdgesExact]] kept as the exact
    * reference. */
  private[graft] def globalMutualEdges(emb: DataFrame,
                                       k: Int = GlobalKnnK): DataFrame =
    graft.sim.ProjGraph.approxMutualEdges(emb, k)

  /** The exact IVF-pruned mutual edges (recall 1.0 by construction) —
    * the recall audit's reference build, no longer the consumer
    * default. */
  private[graft] def globalMutualEdgesExact(emb: DataFrame,
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
        Extensions.globalMutualKnnEdges(s, dir))),
    // Recall audit of the approximate graph build: per probe, how many
    // of the brute-force exact top-k the projection-window directed
    // top-k actually found. UNLIKE the q_embed_ann_* reports (whose
    // oracle cannot reproduce the index and states the recall bound as
    // literal true), the oracle here mirrors the approximate
    // construction itself, so n_hit is DIFFERENTIALLY CHECKED — the
    // gate verifies the measured recall, not a tuned floor (measured:
    // probes 40/40 hits at sf0.01, 25/40 at sf0.1 — the corpus is
    // random noise, the worst ANN regime; see ProjGraph).
    // Clustered-corpus recall audit (round-14 verdict): the synthetic
    // embeddings are RANDOM noise (within-label cosine == cross-label),
    // the hardest possible ANN regime and unlike any real corpus. This
    // query derives a CLUSTERED corpus deterministically (exact integer
    // arithmetic, so the oracle mirrors it): quantize to integers, pull
    // every vector toward its label centroid (y = q + 64·c — centroid
    // power 16x the residual, within-label cosine ≈ 0.94), then run the
    // SAME projection-window construction with the n-ADAPTIVE window
    // and score directed top-k recall against brute force per probe.
    // Differentially checked like q_mutual_recall: the oracle
    // reproduces corpus, chain, window rule, and ground truth, so the
    // gate verifies the measured recall value itself at every SF.
    "q_mutual_recall_clustered" -> ((s, dir) => {
      val ann = clusteredDirectedTopK(s, dir)
        .filter(col("src") < RecallProbes)
        .select(col("src").as("probe_id"), col("dst").as("neighbor_id"),
          lit(1L).as("__hit"))
      val brute = clusteredBruteTopK(s, dir)
      brute.join(ann, Seq("probe_id", "neighbor_id"), "left_outer")
        .groupBy(col("probe_id"))
        .agg(count(lit(1)).as("n_true"),
          count(col("__hit")).as("n_hit"),
          max(when(col("rank") === 1, col("neighbor_id")))
            .as("best_neighbor_id"),
          max(when(col("rank") === 1, col("cos"))).as("best_cos"))
        .orderBy(col("probe_id").asc)
    }),
    "q_mutual_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val ann = Extensions.globalApproxDirected(s, dir)
        .filter(col("src") < RecallProbes)
        .select(col("src").as("probe_id"), col("dst").as("neighbor_id"),
          lit(1L).as("__hit"))
      val brute = graft.sim.Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < RecallProbes), emb, GlobalKnnK)
      brute.join(ann, Seq("probe_id", "neighbor_id"), "left_outer")
        .groupBy(col("probe_id"))
        .agg(count(lit(1)).as("n_true"),
          count(col("__hit")).as("n_hit"),
          max(when(col("rank") === 1, col("neighbor_id")))
            .as("best_neighbor_id"),
          max(when(col("rank") === 1, col("cos"))).as("best_cos"))
        .orderBy(col("probe_id").asc)
    }))

  /** Centroid pull for the clustered synthetic corpus: y = q + 64·c
    * gives the shared centroid 16x the residual's power (64·|c| with
    * |c| ≈ |x|/√n_label ≈ |x|/14 at 200 rows/label → pull ≈ 4·|dev|),
    * so within-label cosine lands ≈ 0.94 vs ≈ 0 cross-label — a
    * realistic tight-cluster regime. */
  private[graft] val ClusterPull = 64L

  /** Deterministic clustered corpus derived from the embeddings table
    * — (vec_id, label, cvec DOUBLE[]). EXACT integer construction so
    * the oracle reproduces it bit-for-bit: q_i = floor(x_i·2²⁴ + 0.5)
    * (exact long), per-(label, dim) centroid c = sum(q) div n_label
    * (order-free integer sum, truncating division — identical in both
    * engines), y_i = q_i + 64·c_i emitted as an exact double (≤ 2³⁰).
    * Cosine is scale-invariant, so the un-normalized integer blend is a
    * legitimate embedding. Store-backed through the plan memo — three
    * consumers (ANN build, brute ground truth, probe filter) read the
    * parquet, not three rebuilds. */
  private[graft] def clusteredCorpus(emb: DataFrame): DataFrame =
    Breadth13.memoizedOnPlan(emb, "clustered_corpus") {
      val q = emb.select(col("vec_id"), col("label"),
        transform(col("embedding").cast("array<double>"), x =>
          floor(x * lit(graft.sim.ProjGraph.QScale) + lit(0.5)).cast("long"))
          .as("q"))
      val terms = q.select(col("vec_id"), col("label"),
        posexplode(col("q")).as(Seq("i", "qi")))
      val cent = terms.groupBy(col("label"), col("i"))
        .agg(sum(col("qi")).as("sq"), count(lit(1)).as("nl"))
        .select(col("label"), col("i"), expr("sq div nl").as("c"))
      terms.join(cent, Seq("label", "i"))
        .groupBy(col("vec_id"), col("label"))
        .agg(sort_array(collect_list(struct(col("i"),
            (col("qi") + lit(ClusterPull) * col("c")).cast("double").as("y"))))
          .getField("y").as("cvec"))
    }

  /** The adaptive-window approximate directed top-k over the clustered
    * corpus, memoized per (session, sf dir) — the warm bench cost of
    * the recall audit is then its marginal join+aggregate, not a full
    * ANN rebuild per run (the bruteTopK discipline). */
  private[queries] def clusteredDirectedTopK(
      s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Extensions.memoized(s, s"clusterann|$dir") {
      val cemb = clusteredCorpus(Tables.embeddings(s, dir))
      val w = graft.sim.ProjGraph.adaptiveWindow(cemb.count())
      graft.sim.ProjGraph.approxDirectedTopK(cemb, GlobalKnnK,
        "vec_id", "cvec", window = w)
    }

  /** Brute-force ground truth over the clustered corpus, memoized. */
  private[queries] def clusteredBruteTopK(
      s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Extensions.memoized(s, s"clusterbrute|$dir") {
      val cemb = clusteredCorpus(Tables.embeddings(s, dir))
      graft.sim.Similarity.bruteForceTopK(
        cemb.filter(col("vec_id") < RecallProbes), cemb, GlobalKnnK,
        vecCol = "cvec")
    }

  /** Probe-set size — ALIASES Extensions.AnnProbes (the one constant
    * also interpolated into bruteRankedSql's `vec_id < N` filter), so
    * the Spark probe filter and the oracle literal cannot drift at a
    * distance (ADVICE, round 14). */
  private[graft] val RecallProbes = Extensions.AnnProbes

  /** The projection-window approximate DIRECTED top-k CTE chain (no
    * leading WITH; eq → topk) over an arbitrary source CTE providing
    * (vec_id, v DOUBLE[]), with the rank window as a SQL expression —
    * the oracle twin of graft.sim.ProjGraph.approxDirectedTopK,
    * mirrored STEP FOR STEP (quantization scale, weight mixer, window
    * width, expansion round, 6-dp cosine re-rank, tie rules), so the
    * differential gate checks the whole construction rather than
    * trusting its recall. The parameterization lets the clustered
    * recall audit run the SAME mirrored construction over a derived
    * corpus with the n-adaptive window
    * (graft.sim.ProjGraph.adaptiveWindow). All weight-mixer
    * intermediates stay below 2⁶², inside DuckDB's overflow-checked
    * BIGINT. Multi-use CTEs are MATERIALIZED — without it DuckDB
    * re-inlines the whole chain at every reference (q_reach_curve's
    * oracle measured 76 s -> 0.2 s); safe here because no recursive
    * term contains a correlated subquery over a materialized CTE (the
    * documented DuckDB trap). */
  private[queries] def projTopkCtes(src: String, windowSql: String): String =
    s"""eq AS (
       |  SELECT vec_id, list_transform(v,
       |    x -> CAST(floor(x * 16777216.0 + 0.5) AS BIGINT)) AS q
       |  FROM $src),
       |pterm AS (
       |  SELECT vec_id, p, qi, i
       |  FROM (SELECT vec_id, unnest(q) AS qi,
       |          unnest(range(1, len(q) + 1)) AS i
       |        FROM eq)
       |  CROSS JOIN (SELECT unnest(range(0, ${graft.sim.ProjGraph.NumProj})) AS p)),
       |ph AS (
       |  SELECT vec_id, p, qi,
       |    ((i * 1103515245 + (p + 1) * 12345) % 2147483648) AS h1
       |  FROM pterm),
       |ph2 AS (
       |  SELECT vec_id, p, qi,
       |    ((xor(h1, h1 // 65536) * 1103515245 + 12345) % 2147483648) AS h3
       |  FROM ph),
       |proj AS (
       |  SELECT vec_id, p,
       |    SUM(CASE WHEN xor(h3, h3 // 65536) % 2 = 1
       |      THEN qi ELSE -qi END) AS score
       |  FROM ph2 GROUP BY vec_id, p),
       |prnk AS MATERIALIZED (
       |  SELECT vec_id, p, row_number() OVER (PARTITION BY p
       |    ORDER BY score, vec_id) AS rn
       |  FROM proj),
       |candp AS MATERIALIZED (
       |  SELECT DISTINCT least(a.vec_id, b.vec_id) AS id_a,
       |    greatest(a.vec_id, b.vec_id) AS id_b
       |  FROM prnk a JOIN prnk b
       |    ON a.p = b.p AND b.rn > a.rn AND b.rn <= a.rn + $windowSql),
       |evp AS (SELECT vec_id, v FROM $src),
       |seedsc AS MATERIALIZED (
       |  SELECT c.id_a, c.id_b,
       |    round(list_dot_product(va.v, vb.v)
       |      / (sqrt(list_dot_product(va.v, va.v))
       |        * sqrt(list_dot_product(vb.v, vb.v))), 6) AS cos
       |  FROM candp c
       |  JOIN evp va ON c.id_a = va.vec_id
       |  JOIN evp vb ON c.id_b = vb.vec_id),
       |seedtop AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (PARTITION BY src
       |      ORDER BY cos DESC, dst) AS rn
       |    FROM (SELECT id_a AS src, id_b AS dst, cos FROM seedsc
       |          UNION ALL SELECT id_b, id_a, cos FROM seedsc))
       |  WHERE rn <= $GlobalKnnK),
       |hop2 AS (
       |  SELECT DISTINCT least(a.src, b.dst) AS id_a,
       |    greatest(a.src, b.dst) AS id_b
       |  FROM seedtop a JOIN seedtop b ON a.dst = b.src
       |  WHERE a.src <> b.dst),
       |hop2new AS (
       |  SELECT id_a, id_b FROM hop2 h
       |  WHERE NOT EXISTS (SELECT 1 FROM seedsc s
       |    WHERE s.id_a = h.id_a AND s.id_b = h.id_b)),
       |allsc AS MATERIALIZED (
       |  SELECT id_a, id_b, cos FROM seedsc
       |  UNION ALL
       |  SELECT h.id_a, h.id_b,
       |    round(list_dot_product(va.v, vb.v)
       |      / (sqrt(list_dot_product(va.v, va.v))
       |        * sqrt(list_dot_product(vb.v, vb.v))), 6) AS cos
       |  FROM hop2new h
       |  JOIN evp va ON h.id_a = va.vec_id
       |  JOIN evp vb ON h.id_b = vb.vec_id),
       |topk AS MATERIALIZED (
       |  SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (PARTITION BY src
       |      ORDER BY cos DESC, dst) AS rn
       |    FROM (SELECT id_a AS src, id_b AS dst, cos FROM allsc
       |          UNION ALL SELECT id_b, id_a, cos FROM allsc))
       |  WHERE rn <= $GlobalKnnK)""".stripMargin

  /** The DEFAULT fixed-window chain over the embeddings table, extended
    * to the mutual filter (eq → mut) — what every global-graph consumer
    * oracle composes onto (see class doc: MATERIALIZED multi-use CTEs,
    * the DuckDB re-inlining trap). */
  private[queries] val projMutualCtes: String =
    s"""esrc AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |         FROM embeddings),
       |${projTopkCtes("esrc", graft.sim.ProjGraph.WindowW.toString)},
       |mut AS MATERIALIZED (
       |  SELECT t.src AS id_a, t.dst AS id_b
       |  FROM topk t JOIN topk r ON t.src = r.dst AND t.dst = r.src
       |  WHERE t.src < t.dst)""".stripMargin

  private val EdgeSql: String =
    s"""$projMutualCtes,
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
         |ORDER BY nn.label""".stripMargin,

    "q_mutual_recall_clustered" ->
      s"""WITH cq AS (
         |  SELECT vec_id, label, list_transform(CAST(embedding AS DOUBLE[]),
         |    x -> CAST(floor(x * 16777216.0 + 0.5) AS BIGINT)) AS q
         |  FROM embeddings),
         |ctm AS (
         |  SELECT label, i, CAST(sum(qi) AS BIGINT) AS sq,
         |    CAST(count(*) AS BIGINT) AS nl
         |  FROM (SELECT label, unnest(q) AS qi,
         |          unnest(range(1, len(q) + 1)) AS i FROM cq)
         |  GROUP BY label, i),
         |carr AS MATERIALIZED (
         |  SELECT label, list(sq // nl ORDER BY i) AS c
         |  FROM ctm GROUP BY label),
         |csrc AS MATERIALIZED (
         |  SELECT cq.vec_id,
         |    list_transform(range(1, len(cq.q) + 1),
         |      i -> CAST(cq.q[i] + $ClusterPull * carr.c[i] AS DOUBLE)) AS v
         |  FROM cq JOIN carr ON cq.label = carr.label),
         |wpar AS (
         |  SELECT CAST(${graft.sim.ProjGraph.WindowW} * pow(2, greatest(0,
         |    CAST(ceil(log2(CAST(count(*) AS DOUBLE) / 512.0) / 2) AS INTEGER)))
         |    AS BIGINT) AS w
         |  FROM csrc),
         |${projTopkCtes("csrc", "(SELECT w FROM wpar)")},
         |probes AS (SELECT vec_id AS probe_id, v AS pv FROM csrc
         |  WHERE vec_id < $RecallProbes),
         |scoredb AS (
         |  SELECT probe_id, csrc.vec_id AS neighbor_id,
         |    round(list_dot_product(pv, v)
         |      / (sqrt(list_dot_product(pv, pv))
         |        * sqrt(list_dot_product(v, v))), 6) AS cos
         |  FROM probes CROSS JOIN csrc WHERE csrc.vec_id <> probe_id),
         |rankedb AS (
         |  SELECT *, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scoredb),
         |tr AS (SELECT * FROM rankedb WHERE rank <= $GlobalKnnK)
         |SELECT tr.probe_id, CAST(count(*) AS BIGINT) AS n_true,
         |  CAST(count(t.dst) AS BIGINT) AS n_hit,
         |  max(CASE WHEN tr.rank = 1 THEN tr.neighbor_id END)
         |    AS best_neighbor_id,
         |  max(CASE WHEN tr.rank = 1 THEN tr.cos END) AS best_cos
         |FROM tr LEFT JOIN topk t
         |  ON t.src = tr.probe_id AND t.dst = tr.neighbor_id
         |GROUP BY tr.probe_id ORDER BY tr.probe_id""".stripMargin,

    "q_mutual_recall" ->
      s"""WITH $projMutualCtes,
         |${Extensions.bruteRankedSql.stripPrefix("WITH ")},
         |tr AS (SELECT * FROM ranked WHERE rank <= $GlobalKnnK)
         |SELECT tr.probe_id, CAST(count(*) AS BIGINT) AS n_true,
         |  CAST(count(t.dst) AS BIGINT) AS n_hit,
         |  max(CASE WHEN tr.rank = 1 THEN tr.neighbor_id END)
         |    AS best_neighbor_id,
         |  max(CASE WHEN tr.rank = 1 THEN tr.cos END) AS best_cos
         |FROM tr LEFT JOIN topk t
         |  ON t.src = tr.probe_id AND t.dst = tr.neighbor_id
         |GROUP BY tr.probe_id ORDER BY tr.probe_id""".stripMargin)
}
