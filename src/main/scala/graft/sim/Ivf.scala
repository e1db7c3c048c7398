package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: partition the corpus into `k` cells by
  * nearest centroid; a query probes only the `nProbe` nearest cells, so
  * search cost is ~|corpus|·nProbe/k instead of |corpus|.
  *
  * Training is deterministic distributed Lloyd: centroids seed from the
  * first k vectors by id, each iteration is a broadcast-join argmin
  * assignment plus an elementwise-mean update via posexplode — only the
  * k×dim centroid table ever leaves the executors; the corpus is never
  * collected. Cell assignment is a plain column on the corpus (at
  * warehouse scale: a partition column, making a probe a partition-pruned
  * scan).
  */
object Ivf {

  /** Per-vector nearest-centroid id, by cosine. */
  private def assign(corpus: DataFrame, centroids: DataFrame,
                     idCol: String, vecCol: String): DataFrame = {
    val scored = corpus.crossJoin(broadcast(centroids))
      .withColumn("__cos", Similarity.cosine(col(vecCol), col("centroid")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__cos").desc, col("centroid_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id"))
  }

  /** Deterministic Lloyd training; returns (centroid_id, centroid). */
  def trainCentroids(corpus: DataFrame, k: Int, iters: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    var centroids = corpus.orderBy(col(idCol).asc).limit(k)
      .select(col(idCol).as("seed_id"), col(vecCol))
      .withColumn("centroid_id",
        (row_number().over(Window.orderBy(col("seed_id").asc)) - 1).cast("int"))
      .select(col("centroid_id"),
        transform(col(vecCol), x => x.cast("double")).as("centroid"))
    (0 until iters).foreach { _ =>
      val assigned = assign(corpus, centroids, idCol, vecCol)
      centroids = assigned
        .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("v").cast("double")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("centroid_id"),
          transform(col("pm"), s => s.getField("m")).as("centroid"))
    }
    centroids
  }

  /** Corpus cell assignment (the index build output). */
  def buildIndex(corpus: DataFrame, centroids: DataFrame,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assign(corpus, centroids, idCol, vecCol)

  /** Deterministic broadcast product: every left row meets every row of
    * the SMALL frame through a BroadcastHashJoin on a key that equals 0
    * on every row — semantically a cross join, but planned as a hash
    * join (the kNN-graph plan pins assert the edge chain contains no
    * BroadcastNestedLoopJoin / CartesianProduct; a product against a
    * kCells-row centroid table is the one place the chain fans out).
    * The key is pmod(hash(id), 1), NOT lit(1): a literal key is
    * constant-folded into a trivially-true join condition and replanned
    * as the nested-loop join the pins forbid; a column-derived zero is
    * opaque to the optimizer. */
  private def bcastProduct(df: DataFrame, leftKey: Column,
                           small: DataFrame, rightKey: Column): DataFrame =
    df.withColumn("__ckl", pmod(hash(leftKey), lit(1)))
      .join(broadcast(small.withColumn("__ckr", pmod(hash(rightKey), lit(1)))),
        col("__ckl") === col("__ckr"))
      .drop("__ckl", "__ckr")

  /** Cell-count rule for [[exactKnnDirected]]: √(n / blocks) cells makes
    * the expected per-(block, cell) population √(n · blocks) / blocks =
    * √(n / blocks), so per-probe pass-1 work is nProbe · √(n / blocks)
    * and the whole build is Θ(n^1.5 / √blocks) — sub-quadratic in n for
    * any block skew (a single hot block stops being Θ(n²)). Clamped to
    * [1, 4096]: past 4096 cells the probe-side cell scoring (n · kCells
    * broadcast-join rows) dominates; production corpora past that point
    * want a coarse quantizer level on top, not more flat cells. */
  def adaptiveCells(n: Long, nBlocks: Long): Int =
    math.max(1, math.min(4096, math.ceil(math.sqrt(
      n.toDouble / math.max(1L, nBlocks).toDouble)).toInt))

  /** Pruning slack in cosine units: the exact rank rounds cosines to
    * 6 dp (half-step 5e-7) and the acos→cos triangle-bound round trip
    * carries last-ulp float error (≤ ~1e-8 away from the poles); 1e-4
    * dominates both with ~200× margin and only ever ADMITS extra cells,
    * never prunes a qualifying one. */
  private val PruneSlack = 1e-4

  /** EXACT within-block directed kNN at ANN cost — the scale-path
    * replacement for the all-pairs-within-block build (which is
    * Σ|block|², quadratic on one hot block). Construction:
    *
    *  1. Lloyd centroids over the whole corpus (deterministic seed: the
    *     kCells smallest ids), cells keyed (block, centroid) so a block
    *     never mixes with another block's candidates.
    *  2. Pass 1 — every vector probes its nProbe angularly-nearest
    *     (block, cell) lists, exact-cosine ranks the members, and takes
    *     its provisional top-k; the k-th ROUNDED cosine is the pruning
    *     threshold θ_k (sentinel −2 when fewer than k candidates: then
    *     nothing may be pruned).
    *  3. Pass 2 — a far cell c with per-(block, cell) angular radius r
    *     can hold a vector u beating θ_k only if
    *     cos(max(0, d(p,c) − r)) ≥ θ_k − slack (triangle inequality on
    *     the sphere: θ(p,u) ≥ θ(p,c) − θ(u,c) ≥ d(p,c) − r). Only such
    *     unpruned cells are searched; survivors re-rank with pass 1.
    *
    * The result is therefore EXACTLY the all-pairs top-k — recall 1.0
    * by construction, not by tuning (parity with the all-pairs twin is
    * pinned in KnnExactIvfSpec at sf0.001/0.01/0.1 and on adversarial
    * synthetic corpora); the miss bound is closed-form 0 because every
    * pruned cell provably contains no qualifying neighbour. Centroid
    * quality affects only the PRUNING RATE, never the output — so the
    * double-sum nondeterminism in Lloyd's avg() is harmless.
    *
    * Scale shape: no corpus×corpus join anywhere — assignment and cell
    * scoring are broadcast products against the kCells-row centroid
    * table, candidate generation is an equi-join on (block, cell), and
    * vectors ride ids-only until the exact re-rank (the
    * cosineNearDupPairs discipline). At warehouse scale `asg` is the
    * materialized cell-assignment table (cell = a partition column) and
    * the inner plan boundaries below are its physical twin. */
  def exactKnnDirected(emb: DataFrame, k: Int, kCells: Int,
                       nProbe: Int = 2, lloydIters: Int = 2,
                       blockCol: String = "label", idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       truncate: Boolean = true): DataFrame = {
    val sp = emb.sparkSession
    import sp.implicits._
    def theta(c: Column): Column =
      acos(greatest(lit(-1.0), least(lit(1.0), c)))
    // Plan-boundary discipline: the build is a DAG of ~10 sub-plans that
    // each reference `asg`/`probeCells`/`top1` several times. With plain
    // persist() the PHYSICAL work is cached but every stage still
    // serializes (and every task deserializes) the full nested logical
    // tree — Lloyd iterations inside broadcast subqueries inside window
    // sorts — measured at sf0.1 as ~70 task-seconds of pure
    // executorDeserializeTime plus a comparable Janino compile-blocked
    // share, dwarfing the actual data work. An eager localCheckpoint
    // restarts each consumer's plan at a LogicalRDD (the shallowest
    // possible serialized task). `truncate = false` keeps the persist()
    // form with the full lazy tree for the plan pins (the *Plan-builder
    // convention: PlanSpec asserts join shapes on the untruncated plan).
    def boundary(df: DataFrame): DataFrame =
      if (truncate) df.localCheckpoint(eager = true)
      else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Lloyd, seeded from the kCells smallest ids (centroid_id = seed id:
    // no global window, so the chain stays free of single-partition
    // exchanges; empty cells simply drop out of later iterations).
    // The centroid table LIVES ON THE DRIVER between iterations — it is
    // bounded metadata (kCells ≤ 4096 rows × dim doubles, the clamp in
    // adaptiveCells; MLlib's KMeans holds exactly the same table on the
    // driver), never corpus-proportional. Collecting it makes every
    // iteration (and everything downstream) start from a LocalTableScan
    // instead of re-embedding the whole prior-iteration lineage in a
    // nested broadcast-subquery cascade.
    var cent: Array[(Long, Seq[Double])] = emb.orderBy(col(idCol).asc)
      .limit(kCells)
      .select(col(idCol).cast("long"),
        transform(col(vecCol), x => x.cast("double")))
      .as[(Long, Seq[Double])].collect()
    def centDF: DataFrame = cent.toSeq.toDF("centroid_id", "centroid")
    val wA = Window.partitionBy(col(idCol))
      .orderBy(col("__cc").desc, col("centroid_id").asc)
    (0 until lloydIters).foreach { _ =>
      val asgI = bcastProduct(emb.select(col(idCol), col(vecCol)),
          col(idCol), centDF, col("centroid_id"))
        .withColumn("__cc", Similarity.cosine(col(vecCol), col("centroid")))
        .withColumn("__rn", row_number().over(wA))
        .filter(col("__rn") === 1)
      cent = asgI
        .select(col("centroid_id"),
          posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("v").cast("double")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("centroid_id").cast("long"),
          transform(col("pm"), s => s.getField("m")))
        .as[(Long, Seq[Double])].collect()
    }
    val centroids = centDF
    // Cell assignment with the block kept; __theta = angle to own
    // centroid (feeds the per-(block, cell) radius). Read 4× below.
    val asg = bcastProduct(
        emb.select(col(blockCol), col(idCol), col(vecCol)),
        col(idCol), centroids, col("centroid_id"))
      .withColumn("__cc", Similarity.cosine(col(vecCol), col("centroid")))
      .withColumn("__rn", row_number().over(wA))
      .filter(col("__rn") === 1)
      .select(col(blockCol), col(idCol), col(vecCol), col("centroid_id"),
        theta(col("__cc")).as("__theta"))
    val asgB = boundary(asg)
    // The broadcast routing table: |blocks|·kCells rows of radius +
    // centroid vector.
    val cellStats = asgB.groupBy(col(blockCol), col("centroid_id"))
      .agg(max(col("__theta")).as("__radius"))
      .join(centroids, "centroid_id")
    // Probe → cell scoring; vectors dropped before the rank shuffle.
    val wC = Window.partitionBy(col("__src"))
      .orderBy(col("__d").asc, col("centroid_id").asc)
    val probeCells = asgB
      .select(col(blockCol), col(idCol).as("__src"), col(vecCol).as("__pv"))
      .join(broadcast(cellStats), Seq(blockCol))
      .withColumn("__d", theta(Similarity.cosine(col("__pv"), col("centroid"))))
      .select(col(blockCol), col("__src"), col("centroid_id"), col("__d"),
        col("__radius"))
      .withColumn("__cr", row_number().over(wC))
    val probeCellsB = boundary(probeCells)
    val idx = asgB.select(col(blockCol), col("centroid_id"),
      col(idCol).as("__dst"))
    val va = asgB.select(col(idCol).as("__src"), col(vecCol).as("__va"))
    val vb = asgB.select(col(idCol).as("__dst"), col(vecCol).as("__vb"))
    // ids-only candidate pairs → vectors join on exactly once → the
    // SAME rounded cosine expression as the all-pairs twin (bit parity).
    def score(cells: DataFrame): DataFrame =
      cells.join(idx, Seq(blockCol, "centroid_id"))
        .filter(col("__src") =!= col("__dst"))
        .join(va, "__src").join(vb, "__dst")
        .withColumn("__cos",
          round(Similarity.cosine(col("__va"), col("__vb")), 6))
        .select(col("__src"), col("__dst"), col("__cos"))
    val wK = Window.partitionBy(col("__src"))
      .orderBy(col("__cos").desc, col("__dst").asc)
    val top1 = boundary(score(probeCellsB.filter(col("__cr") <= nProbe)
        .select(col(blockCol), col("centroid_id"), col("__src")))
      .withColumn("__rn", row_number().over(wK))
      .filter(col("__rn") <= k)
      .select(col("__src"), col("__dst"), col("__cos")))
    // k-th best rounded cosine per probe; a probe with < k pass-1
    // candidates may prune nothing (sentinel −2 keeps every far cell).
    val kth = top1.groupBy(col("__src"))
      .agg(count(lit(1)).as("__nc"), min(col("__cos")).as("__kc"))
      .select(col("__src"),
        when(col("__nc") >= k, col("__kc")).otherwise(lit(-2.0)).as("__kth"))
    // LEFT join: a probe with zero pass-1 candidates has no kth row at
    // all — it must still search every far cell, not vanish.
    val far = probeCellsB.filter(col("__cr") > nProbe)
      .join(kth, Seq("__src"), "left_outer")
      .filter(coalesce(col("__kth"), lit(-2.0)) === lit(-2.0) ||
        cos(greatest(lit(0.0), col("__d") - col("__radius"))) >=
          coalesce(col("__kth"), lit(-2.0)) - lit(PruneSlack))
      .select(col(blockCol), col("centroid_id"), col("__src"))
    // Final exact top-k over pass-1 winners ∪ unpruned-cell candidates.
    // Using top1 (not all pass-1 candidates) is lossless: anything in
    // the union's top-k that came from pass 1 ranks ≤ k there too.
    top1.unionByName(score(far))
      .withColumn("__rn", row_number().over(wK))
      .filter(col("__rn") <= k)
      .select(col("__src").as("src"), col("__dst").as("dst"))
  }

  /** ANN top-k: probe the nProbe nearest cells only, exact cosine rank
    * within the candidates. */
  def ivfTopK(probes: DataFrame, index: DataFrame, centroids: DataFrame,
              nProbe: Int, k: Int, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"))
    val probeCells = p.crossJoin(broadcast(centroids))
      .withColumn("__cos", Similarity.cosine(col("pv"), col("centroid")))
    val wc = Window.partitionBy(col("probe_id"))
      .orderBy(col("__cos").desc, col("centroid_id").asc)
    val cells = probeCells.withColumn("__rn", row_number().over(wc))
      .filter(col("__rn") <= nProbe)
      .select(col("probe_id"), col("pv"), col("centroid_id"))
    val cands = broadcast(cells)
      .join(index.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col("centroid_id")), Seq("centroid_id"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", round(Similarity.cosine(col("pv"), col("cv")), 6))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
