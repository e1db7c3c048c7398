package graft.sim

import org.apache.spark.sql.DataFrame
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
