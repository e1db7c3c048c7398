package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hundred-forty-third wave — the MULTICLASS NEAREST-CENTROID PROBE
  * over the embedding corpus: fit one centroid per label, assign every
  * vector to its nearest centroid, and report the label↔prediction
  * confusion — the standard "can a trivial geometric model read the
  * cluster structure off the representation" probe of an embedding
  * pipeline (and the exact evaluation loop of a k-means-style
  * labeling).
  *
  * All-int64 construction:
  *  - coordinates quantize once: q = floor(e·1e3 + 0.5) (|q| ≤ 578);
  *  - label centroids as FLOORED integer means μ̂_c = S div n per
  *    coordinate (trunc-toward-zero `div` = DuckDB `//`; the ≤1-unit
  *    flooring bias is 3 orders below inter-centroid distances);
  *  - nearest-by-L2 via the expanded form: argmin_c ‖q − μ̂_c‖² =
  *    argmax_c (2·q·μ̂_c − ‖μ̂_c‖²) — every score an exact int64
  *    (|score| ≤ 2·64·578² ≈ 4.3e7, corpus-size-independent); ties
  *    break label-ascending in both engines.
  *
  * Scale shape: centroids are ONE groupBy(label, pos) integer
  * aggregate with map-side partials (|labels|·64 groups); scoring
  * broadcasts the |labels|-row centroid table and runs map-side
  * (explode × |labels| with a per-vector max(struct) re-aggregate —
  * no window, no per-row shuffle beyond the vec_id partial groups);
  * the confusion is a |labels|²-group aggregate. At 100 TB: two
  * shuffles of partial rows, one broadcast.
  */
object Breadth142 {

  private[graft] val ProbeDim = 64

  /** (vec_id, label, q: 64-long quantized coords). */
  private[graft] def probeFeatures(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label").cast("long").as("label"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(1.0e3) + lit(0.5)).cast("long"))
        .as("__q"))

  /** Per-label centroid rows: (label, __mu 64-list, __mu2 = ‖μ̂‖²). */
  private[graft] def centroids(emb: DataFrame): DataFrame =
    probeFeatures(emb)
      .select(col("label"), posexplode(col("__q")).as(Seq("__p0", "__x")))
      .groupBy(col("label"), (col("__p0") + 1).as("pos"))
      .agg(sum(col("__x")).as("__s"), count(lit(1)).as("__n"))
      .select(col("label"), col("pos"), expr("__s div __n").as("__m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("__m"))))
        .as("__pm"))
      .select(col("label").as("__clabel"),
        transform(col("__pm"), s => s.getField("__m")).as("__mu"))
      .withColumn("__mu2",
        aggregate(col("__mu"), lit(0L), (acc, m) => acc + m * m))

  /** Every vector's predicted label: (vec_id, label, pred, score). */
  private[graft] def assignments(emb: DataFrame): DataFrame = {
    val fx = probeFeatures(emb)
    fx.crossJoin(broadcast(centroids(emb)))
      .select(col("vec_id"), col("label"),
        col("__clabel"),
        (lit(2L) * aggregate(zip_with(col("__q"), col("__mu"),
          (a, b) => a * b), lit(0L), (acc, x) => acc + x)
          - col("__mu2")).as("__score"))
      .groupBy(col("vec_id"), col("label"))
      .agg(max(struct(col("__score"), (-col("__clabel")).as("__negc")))
        .as("__best"))
      .select(col("vec_id"), col("label"),
        (-col("__best").getField("__negc")).as("pred"),
        col("__best").getField("__score").as("score"))
  }

  /** The label↔prediction confusion matrix (nonzero cells only). */
  private[graft] def probeConfusion(emb: DataFrame): DataFrame =
    assignments(emb)
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label").asc, col("pred").asc)

  /** Overall + macro evaluation: n, n_correct, accuracy, macro recall
    * (per-class recalls quantized to 1e-9 before the 10-term sum). */
  private[graft] def probeEval(emb: DataFrame): DataFrame =
    assignments(emb)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("pred") === col("label"), 1L).otherwise(0L))
          .as("__c"))
      .select(col("__n"), col("__c"),
        floor(col("__c").cast("double") / col("__n").cast("double")
          * lit(1.0e9) + lit(0.5)).cast("long").as("__rq"))
      .agg(sum(col("__n")).as("n"), sum(col("__c")).as("n_correct"),
        count(lit(1)).as("n_classes"), sum(col("__rq")).as("__rsum"))
      .select(col("n"), col("n_correct"), col("n_classes"),
        (col("n_correct").cast("double") / col("n").cast("double"))
          .as("accuracy"),
        (col("__rsum").cast("double")
          / (lit(1.0e9) * col("n_classes").cast("double")))
          .as("macro_recall"))

  val defs: Map[String, Q] = Map(
    "q_centroid_probe" -> ((s, dir) =>
      probeConfusion(Tables.embeddings(s, dir))),
    "q_probe_eval" -> ((s, dir) => probeEval(Tables.embeddings(s, dir))))

  /** Quantize + centroid + assignment CTE chain (no leading WITH). */
  private val ProbeSql: String =
    s"""fx AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(floor(x * 1.0e3 + 0.5) AS BIGINT)) AS q
       |  FROM embeddings),
       |dense AS (
       |  SELECT vec_id, label, unnest(range(1, ${ProbeDim + 1})) AS pos,
       |    unnest(q) AS v
       |  FROM fx),
       |cen AS (
       |  SELECT label AS clabel, pos,
       |    CAST(sum(v) AS BIGINT) // CAST(count(*) AS BIGINT) AS m
       |  FROM dense GROUP BY label, pos),
       |mu2 AS (
       |  SELECT clabel, CAST(sum(m * m) AS BIGINT) AS m2
       |  FROM cen GROUP BY clabel),
       |sc AS (
       |  SELECT d.vec_id, d.label, c.clabel,
       |    2 * CAST(sum(d.v * c.m) AS BIGINT) - max(u.m2) AS score
       |  FROM dense d
       |  JOIN cen c ON d.pos = c.pos
       |  JOIN mu2 u ON c.clabel = u.clabel
       |  GROUP BY d.vec_id, d.label, c.clabel),
       |asg AS (
       |  SELECT vec_id, label, clabel AS pred FROM (
       |    SELECT vec_id, label, clabel,
       |      row_number() OVER (PARTITION BY vec_id
       |        ORDER BY score DESC, clabel) AS rn
       |    FROM sc)
       |  WHERE rn = 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_centroid_probe" ->
      s"""WITH $ProbeSql
         |SELECT label, pred, CAST(count(*) AS BIGINT) AS n
         |FROM asg
         |GROUP BY label, pred
         |ORDER BY label, pred""".stripMargin,

    "q_probe_eval" ->
      s"""WITH $ProbeSql,
         |perc AS (
         |  SELECT label, CAST(count(*) AS BIGINT) AS cn,
         |    CAST(sum(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cc
         |  FROM asg GROUP BY label)
         |SELECT CAST(sum(cn) AS BIGINT) AS n,
         |  CAST(sum(cc) AS BIGINT) AS n_correct,
         |  CAST(count(*) AS BIGINT) AS n_classes,
         |  CAST(sum(cc) AS DOUBLE) / CAST(sum(cn) AS DOUBLE) AS accuracy,
         |  CAST(sum(CAST(floor(CAST(cc AS DOUBLE) / CAST(cn AS DOUBLE)
         |      * 1.0e9 + 0.5) AS BIGINT)) AS DOUBLE)
         |    / (1.0e9 * CAST(count(*) AS DOUBLE)) AS macro_recall
         |FROM perc""".stripMargin)
}
