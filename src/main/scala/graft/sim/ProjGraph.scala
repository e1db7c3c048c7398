package graft.sim

import graft.ops.GlobalRank
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sub-quadratic approximate kNN graph via projection-sort
  * candidate windows — the scale-path replacement for the exact IVF
  * mutual-kNN build, whose Θ(n^1.5/√cells) envelope measured 18.7× at
  * 10× data (in-envelope, but ~1000× work at 100×).
  *
  * Construction (every step linear in n, and exactly reproducible in
  * ANSI SQL, so consumer oracles mirror it rather than trusting recall):
  *
  *  1. Quantize each float component to an exact integer
  *     (floor(x·2²⁴ + 0.5) — float-to-double is exact, the product by a
  *     power of two is exact, so both engines get bit-identical longs).
  *  2. P deterministic ±1 hyperplane projections: score_p(v) =
  *     Σ_i w(p,i)·q_i — an ORDER-FREE integer sum (the documented
  *     float-mean parity discipline), weights from a 2-round
  *     LCG+xorshift mixer of (p, i) that both engines compute in plain
  *     64-bit-safe integer arithmetic (all intermediates < 2⁶², so
  *     DuckDB's overflow-checked BIGINT never trips).
  *  3. Rank each projection's scores ((p, score, vec_id) order — unique
  *     keys) with the distributed global rank, and take as candidates
  *     every pair within rank distance ≤ W in some projection: nearby
  *     vectors project nearby, so true neighbours co-occur in at least
  *     one window with high probability (the classic random-projection
  *     sliding-window dedup scheme).
  *  4. One neighbour-of-neighbour expansion round (NN-Descent's core
  *     step, non-recursive so the SQL twin stays a plain CTE): the
  *     provisional top-k's 2-hop pairs join the candidate set.
  *  5. Exact 6-dp cosine re-rank of the candidates per source, top-k
  *     (cos DESC, dst ASC), then the mutual filter.
  *
  * Scale shape: map-only scoring, one range shuffle for the rank, W-fold
  * id-only explode for the window join, id-keyed joins for re-rank — no
  * per-block quadratic anywhere; candidates per node ≤ 2·P·W + k², so
  * total work is Θ(n·(P·W + k²)·dim). Recall is AUDITED, not assumed:
  * q_mutual_recall scores the directed top-k against brute-force ground
  * truth per probe, and the consumer oracles reproduce this exact
  * construction, so correctness never rides on recall. */
object ProjGraph {

  /** Projections / window / quantization — shared with the SQL twin
    * (Breadth141.projMutualCtes); change BOTH or parity breaks. Sized
    * on the synthetic corpus, which is RANDOM noise (within-label
    * cosine == cross-label — the documented perceptron finding), the
    * hardest possible ANN regime: measured directed top-4 recall 0.96
    * at sf0.01 / 0.59 at sf0.1 (probe nodes 4/4 at the sf0.01 gate),
    * where NN-Descent expansion adds almost nothing because random
    * data has no neighbour-of-neighbour structure. On a real clustered
    * corpus the same parameters land far higher; q_mutual_recall keeps
    * the measurement honest either way. */
  private[graft] val NumProj = 16
  private[graft] val WindowW = 32
  private[graft] val QScale = 16777216.0 // 2^24

  /** ±1 weight for (projection p, 1-based dim i): two LCG rounds with a
    * 16-bit xorshift between them, bit 0 as the sign. Operands stay
    * below 2³¹ so every product is < 2⁶² (DuckDB BIGINT-safe). */
  private def wsign(p: Int, i1: Column): Column = {
    val h1 = (i1 * lit(1103515245L) + lit((p + 1) * 12345L)) % lit(2147483648L)
    val h2 = h1.bitwiseXOR(shiftright(h1, 16))
    val h3 = (h2 * lit(1103515245L) + lit(12345L)) % lit(2147483648L)
    val h4 = h3.bitwiseXOR(shiftright(h3, 16))
    when(h4 % 2 === 1, lit(1L)).otherwise(lit(-1L))
  }

  /** Exact integer projection score of the vector under projection p. */
  private def scoreExpr(vecCol: Column, p: Int): Column =
    aggregate(
      transform(vecCol, (x, i) =>
        wsign(p, i.cast("long") + lit(1L)) *
          floor(x.cast("double") * lit(QScale) + lit(0.5)).cast("long")),
      lit(0L), (acc, t) => acc + t)

  /** (id, p, score) — one row per vector per projection, map-only. */
  private[graft] def projScores(emb: DataFrame, idCol: String,
                                vecCol: String): DataFrame =
    emb.select(col(idCol),
        explode(array((0 until NumProj).map(p =>
          struct(lit(p).as("p"), scoreExpr(col(vecCol), p).as("score"))): _*))
          .as("__ps"))
      .select(col(idCol), col("__ps.p").as("p"), col("__ps.score").as("score"))

  /** Canonical (id_a < id_b) distinct candidate pairs from the P
    * projection-sort windows. */
  private[graft] def windowCandidates(emb: DataFrame, idCol: String,
                                      vecCol: String): DataFrame = {
    val ranked = GlobalRank.withGlobalRank(
      projScores(emb, idCol, vecCol), "__grk",
      col("p"), col("score"), col(idCol))
    // rank differences within a projection equal combined-rank
    // differences (each p's section is contiguous), so the W-successor
    // join is a plain equi-join on (p, rank+j) — ids only, W-fold
    // explode on one side, never a range join.
    val aSide = ranked.select(col("p"), col("__grk"), col(idCol).as("__sa"))
      .withColumn("__j", explode(array((1 to WindowW).map(lit): _*)))
      .select(col("p"), (col("__grk") + col("__j")).as("__grk"), col("__sa"))
    val bSide = ranked.select(col("p"), col("__grk"), col(idCol).as("__sb"))
    aSide.join(bSide, Seq("p", "__grk"))
      .select(least(col("__sa"), col("__sb")).as("id_a"),
        greatest(col("__sa"), col("__sb")).as("id_b"))
      .distinct()
  }

  /** Exact 6-dp cosine for canonical id pairs (vectors join on once). */
  private def scorePairs(pairs: DataFrame, emb: DataFrame, idCol: String,
                         vecCol: String): DataFrame = {
    val va = emb.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val vb = emb.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    pairs.join(va, "id_a").join(vb, "id_b")
      .withColumn("cos",
        round(Similarity.cosine(col("__va"), col("__vb")), 6))
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Directed per-src top-k rows (src, dst, cos) from canonically-
    * scored pairs. */
  private def topKDirectedScored(scored: DataFrame, k: Int): DataFrame = {
    val dirs = scored.select(col("id_a").as("src"), col("id_b").as("dst"),
        col("cos"))
      .unionByName(scored.select(col("id_b").as("src"),
        col("id_a").as("dst"), col("cos")))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cos").desc, col("dst").asc)
    dirs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("src"), col("dst"), col("cos"))
  }

  /** Approximate DIRECTED top-k: projection-window candidates, one
    * neighbour-of-neighbour expansion, exact cosine re-rank. */
  def approxDirectedTopK(emb: DataFrame, k: Int,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    // the provisional top-k is derived from the scored seed pairs and
    // reused by the expansion AND the final rank — checkpoint it once
    // (the exactKnnDirected boundary discipline). The seed-pair frame
    // itself (n·P·W rows) is read twice (top-k + the expansion's
    // already-scored anti-join) and checkpointed for the same reason.
    val seedScored = scorePairs(
      windowCandidates(emb, idCol, vecCol), emb, idCol, vecCol)
      .localCheckpoint(eager = true)
    val seedTop = topKDirectedScored(seedScored, k)
      .localCheckpoint(eager = true)
    // 2-hop expansion: (a -> b, b -> c) => candidate (a, c); k² per
    // node, ids only until the re-rank join.
    val hop2 = seedTop.select(col("src"), col("dst").as("__mid"))
      .join(seedTop.select(col("src").as("__mid"), col("dst").as("__far")),
        "__mid")
      .filter(col("src") =!= col("__far"))
      .select(least(col("src"), col("__far")).as("id_a"),
        greatest(col("src"), col("__far")).as("id_b"))
      .distinct()
      // only score pairs the seed round has not already scored
      .join(seedScored.select(col("id_a"), col("id_b")),
        Seq("id_a", "id_b"), "left_anti")
    val hop2Scored = scorePairs(hop2, emb, idCol, vecCol)
    // Final rank inputs are the SEED TOP-K rows plus the expansion's
    // new pairs, not all n·P·W seed pairs again: a seed candidate of
    // src ranked below its seed top-k is dominated by k still-present
    // better candidates, so it can never enter the final top-k — the
    // output is provably identical to ranking the full union (which is
    // what the SQL twin ranks), at a window input of n·k + |hop2| rows
    // instead of 2·n·P·W.
    val finalDirs = seedTop
      .unionByName(hop2Scored.select(col("id_a").as("src"),
        col("id_b").as("dst"), col("cos")))
      .unionByName(hop2Scored.select(col("id_b").as("src"),
        col("id_a").as("dst"), col("cos")))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cos").desc, col("dst").asc)
    finalDirs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("src"), col("dst"))
  }

  /** Approximate mutual undirected edges — the default global graph. */
  def approxMutualEdges(emb: DataFrame, k: Int,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame =
    graft.queries.Breadth101.mutualFromDirected(
      approxDirectedTopK(emb, k, idCol, vecCol))
}
