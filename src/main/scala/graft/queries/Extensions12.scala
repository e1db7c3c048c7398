package graft.queries

import graft.Tables
import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-pipeline wave 12 — the two curation ops a pretraining-data
  * pipeline runs between dedup and sampling that the inventory lacked:
  *
  *  - k-means clustering over the embedding table (diversity bucketing
  *    / topic maps — the standard pre-sampling structure pass), as a
  *    DETERMINISTIC quantized Lloyd iteration: md5-ordered seeds, two
  *    assignment rounds, floor-quantized integer centroids;
  *  - DSIR-style importance weighting (Xie et al. 2023's
  *    data-selection shape): per-token log-ratio of a target-domain
  *    unigram LM against the corpus LM, summed per document — the
  *    score that importance-resamples raw data toward a target
  *    distribution.
  *
  * Exact-parity discipline: embeddings quantize to integer 1e-6 units
  * (float→double is exact, one floor each); every distance is an
  * integer sum of squared integer deltas (≤ 64·(1.2e6)² ≈ 9·10¹³,
  * comfortably int64 and below 2⁵³ so the oracle's double
  * `list_dot_product` path is exact too); centroid updates floor an
  * exactly-representable double quotient (explicit floor — NOT integer
  * division, whose negative-operand semantics differ between engines);
  * assignment ties break toward the smallest centroid id. The DSIR
  * per-token term is a log of exactly-agreed doubles (integer counts,
  * two divisions in pinned operand order); per-doc sums of ~10² such
  * terms round to 4 dp (the q_token_entropy transcendental
  * discipline).
  *
  * Scale shape: k-means is vecs × k with the K-row centroid table
  * BROADCAST (never a shuffled cartesian), one (cid, pos) hash
  * aggregate per update (|k|·|dim| groups — constant-sized), and
  * lineage resets between rounds are unnecessary at 2 fixed
  * iterations. DSIR joins doc tokens against the |vocab|-sized term
  * table (the q_unigram_lm altitude) — nothing is ever doc × vocab.
  * Int64 headroom at 10⁹ vectors: per-cluster Σd² would reach ~10²³ —
  * the emitted d2 stays per-ROW (bounded by dim·range²); only a
  * deployment summing inertia per cluster must widen to decimal.
  */
object Extensions12 {

  private[graft] val K = 8
  private[graft] val QScale = 1.0e6

  /** Integer-quantized embedding vectors (1e-6 units, exact floor). */
  private[graft] def quantVecs(df: DataFrame): DataFrame =
    df.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(QScale)).cast("long")).as("qv"))

  /** The K seed centroids: the quantized vectors of the K smallest
    * md5(vec_id) keys (RNG-free — the q_hash_sample discipline), with
    * centroid ids 0..K-1 in that md5 order. */
  private[graft] def seedCentroids(q: DataFrame): DataFrame = {
    val picked = q.withColumn("__h", md5(col("vec_id").cast("string")))
      .orderBy(col("__h").asc, col("vec_id").asc).limit(K)
    picked
      .withColumn("cid",
        row_number().over(Window.orderBy(col("__h").asc, col("vec_id").asc))
          .cast("long") - lit(1L))
      .select(col("cid"), col("qv").as("cv"))
  }

  /** Nearest-centroid assignment: integer squared L2 against each of
    * the K broadcast centroids, ties to the smallest centroid id. */
  private[graft] def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val d2 = aggregate(
      zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("__d2").asc, col("cid").asc)
    vecs.crossJoin(broadcast(cents))
      .withColumn("__d2", d2)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("vec_id"), col("qv"), col("cid"), col("__d2").as("d2"))
  }

  /** Lloyd update with floor-quantized integer centroids: per (cid,
    * dimension) the floored mean of member components — floor of an
    * exact double quotient, so the centroid stays integer and the
    * next assignment stays in exact arithmetic. Clusters that lost
    * every member simply drop out (deterministic in both engines). */
  private[graft] def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("qv")).as(Seq("pos", "q")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("q")).as("__s"), count(lit(1)).as("__n"))
      .withColumn("__m",
        floor(col("__s").cast("double") / col("__n")).cast("long"))
      .groupBy(col("cid"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("__m")))),
        _.getField("__m")).as("cv"))

  /** Two deterministic Lloyd rounds: seed → assign → update → assign.
    * Emits the final per-vector assignment with its integer squared
    * distance. */
  private[graft] def kmeansAssign(df: DataFrame): DataFrame = {
    val vecs = quantVecs(df)
    val a1 = assign(vecs, seedCentroids(vecs))
    assign(vecs, update(a1))
      .select(col("vec_id"), col("cid").as("cluster"), col("d2"))
  }

  /** DSIR importance weight per document: target = the 'en' slice,
    * raw = the whole corpus. Per corpus token, the add-one-smoothed
    * log likelihood ratio
    *   w(t) = ln( ((ct+1)/(Nt+V)) / ((cs+1)/(Ns+V)) )
    * (ct/cs = target/corpus counts, Nt/Ns = total tokens, V = corpus
    * vocabulary), computed once in the |vocab|-sized table; the doc
    * weight is Σ c_doc(t)·w(t) over the doc's tokens. */
  private[graft] def dsirWeights(docs: DataFrame, targetLang: String)
  : DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(Text.tokens(col("text"))).as("tok"))
    val dt = toks.groupBy(col("doc_id"), col("lang"), col("tok"))
      .agg(count(lit(1)).as("__c"))
    val cs = toks.groupBy(col("tok")).agg(count(lit(1)).as("__cs"))
    val ct = toks.filter(col("lang") === targetLang)
      .groupBy(col("tok")).agg(count(lit(1)).as("__ct"))
    val m = cs.agg(sum(col("__cs")).as("__ns"),
      count(lit(1)).as("__v"))
    val mt = ct.agg(sum(col("__ct")).as("__nt"))
    val term = cs.join(ct, Seq("tok"), "left")
      .crossJoin(broadcast(m)).crossJoin(broadcast(mt))
      .select(col("tok"),
        log(((coalesce(col("__ct"), lit(0L)) + lit(1.0)) /
          (col("__nt") + col("__v"))) /
          ((col("__cs") + lit(1.0)) / (col("__ns") + col("__v"))))
          .as("__w"))
    dt.join(term, Seq("tok"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("__c")).as("n_tokens"),
        round(sum(col("__c") * col("__w")), 4).as("dsir_w"))
  }

  val defs: Map[String, Q] = Map(
    // Deterministic 2-round quantized k-means over the embedding table.
    "q_kmeans" -> ((s, dir) =>
      kmeansAssign(Tables.embeddings(s, dir))
        .orderBy(col("vec_id").asc)),

    // DSIR importance weights toward the 'en' target slice.
    "q_dsir" -> ((s, dir) =>
      dsirWeights(Tables.documents(s, dir), "en")
        .orderBy(col("doc_id").asc)))

  /** Shared quantize + d2 + argmin SQL fragments. d2 via the dot-product
    * expansion on DOUBLE lists — every addend is an integer below 2⁵³,
    * so the double path is exact and order-free. */
  private def sqlQuant =
    """e AS (
      |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
      |  FROM embeddings)""".stripMargin

  private def sqlD2(a: String, b: String) =
    s"""CAST(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[]))
       |  - 2 * list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))
       |  + list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[]))
       |  AS BIGINT)""".stripMargin

  private def sqlAssign(cents: String, out: String) =
    s"""$out AS (
       |  SELECT vec_id, qv, cid, d2 FROM (
       |    SELECT vec_id, qv, cid, d2,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
       |    FROM (
       |      SELECT e.vec_id, e.qv, s.cid, ${sqlD2("e.qv", "s.cv")} AS d2
       |      FROM e, $cents s))
       |  WHERE rn = 1)""".stripMargin

  /** The full 2-round assignment CTE chain (final table `a2`) — shared
    * by the q_kmeans oracle and downstream cluster roll-ups so the
    * clustering parameters cannot drift between consumers. */
  private[queries] def kmeansCtes =
    s"""$sqlQuant,
       |seeds AS (
       |  SELECT CAST(row_number() OVER (ORDER BY h, vec_id) AS BIGINT) - 1
       |      AS cid, qv AS cv
       |  FROM (
       |    SELECT vec_id, qv, md5(CAST(vec_id AS VARCHAR)) AS h FROM e
       |    ORDER BY h, vec_id LIMIT $K)),
       |${sqlAssign("seeds", "a1")},
       |u AS (
       |  SELECT cid, idx,
       |    CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS m
       |  FROM (
       |    SELECT cid, unnest(qv) AS v,
       |      unnest(range(1, len(qv) + 1)) AS idx
       |    FROM a1)
       |  GROUP BY cid, idx),
       |c1 AS (SELECT cid, list(m ORDER BY idx) AS cv FROM u GROUP BY cid),
       |${sqlAssign("c1", "a2")}""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_kmeans" ->
      s"""WITH $kmeansCtes
         |SELECT vec_id, cid AS cluster, d2 FROM a2
         |ORDER BY vec_id""".stripMargin,

    "q_dsir" ->
      s"""WITH tok AS (
         |  SELECT doc_id, lang, unnest(${Extensions.sqlTokens("text")}) AS tok
         |  FROM documents),
         |dt AS (
         |  SELECT doc_id, lang, tok, count(*) AS c
         |  FROM tok GROUP BY 1, 2, 3),
         |cs AS (SELECT tok, count(*) AS cs FROM tok GROUP BY tok),
         |ct AS (SELECT tok, count(*) AS ct FROM tok WHERE lang = 'en'
         |  GROUP BY tok),
         |m AS (SELECT CAST(sum(cs) AS BIGINT) AS ns,
         |    CAST(count(*) AS BIGINT) AS v FROM cs),
         |mt AS (SELECT CAST(sum(ct) AS BIGINT) AS nt FROM ct),
         |term AS (
         |  SELECT cs.tok,
         |    ln((CAST(coalesce(ct.ct, 0) + 1 AS DOUBLE) / (mt.nt + m.v))
         |      / (CAST(cs.cs + 1 AS DOUBLE) / (m.ns + m.v))) AS w
         |  FROM cs LEFT JOIN ct USING (tok), m, mt)
         |SELECT dt.doc_id, dt.lang, CAST(sum(dt.c) AS BIGINT) AS n_tokens,
         |  round(sum(dt.c * t.w), 4) AS dsir_w
         |FROM dt JOIN term t USING (tok)
         |GROUP BY dt.doc_id, dt.lang
         |ORDER BY dt.doc_id""".stripMargin)
}
