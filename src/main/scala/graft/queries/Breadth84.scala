package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Eighty-fifth wave — Markov chains and bipartite graph shape.
  *
  *  - **q_markov_stationary**: the stationary distribution of the
  *    pooled event-type transition chain, by 20 unrolled power
  *    iterations in INTEGER fixed-point (scale 1e9, floor division —
  *    the q_pagerank_int discipline): every iteration is a sum of
  *    exact int64 terms, so the result is bit-equal on any engine and
  *    any partitioning, with dangling-state mass redistributed
  *    uniformly. The |types|²-bounded count matrix folds in ONE UDF
  *    call (the mcFold rationale: the state space is tiny, the data
  *    scan that builds it is the distributed part).
  *  - **q_bipartite_proj**: the supplier projection of the
  *    supplier–part bipartite graph — for supplier pairs sharing ≥2
  *    parts: shared-part count and part-set Jaccard, top 20. Pairs
  *    are generated per part (Σ per-part-degree², never
  *    supplier-quadratic) with hub parts above BpMaxPartDeg suppliers
  *    excluded — the LSH-band candidate discipline plus its degree cap,
  *    so one hot part can never emit a quadratic pair volume.
  *  - **q_degree_hist**: the degree DISTRIBUTION of both sides of
  *    that bipartite graph — (side, degree) → node count, the
  *    aggregate shape complement of per-node q_graph_degree.
  *
  * Scale shape: the transition matrix build is one map-side-combinable
  * groupBy to ≤|types|² cells; the projection joins on part id (skew
  * bounded by per-part supplier counts); the histogram is two
  * groupBys. No floats anywhere except the two emitted ratio
  * divisions of exact integers. */
object Breadth84 {

  private[graft] val MkScale = 1000000000L
  private[graft] val MkIters = 20
  private[graft] val BpMinShared = 2
  private[graft] val BpTopN = 20
  private[graft] val BpMaxPartDeg = 256

  private[graft] val mkFold =
    udf { (states: Seq[String], prevs: Seq[String], nexts: Seq[String],
           cnts: Seq[Long]) =>
      val idx = states.zipWithIndex.toMap
      val n = states.length
      val rowsum = Array.fill(n)(0L)
      val es = prevs.indices
        .map(i => (idx(prevs(i)), idx(nexts(i)), cnts(i)))
      es.foreach { case (i, _, c) => rowsum(i) += c }
      var pi = Array.fill(n)(MkScale)
      for (_ <- 1 to MkIters) {
        val nxt = Array.fill(n)(0L)
        var dang = 0L
        for (i <- 0 until n if rowsum(i) == 0L) dang += pi(i) / n
        es.foreach { case (i, j, c) => nxt(j) += pi(i) * c / rowsum(i) }
        for (j <- 0 until n) nxt(j) += dang
        pi = nxt
      }
      states.zip(pi).map { case (s, p) => (s, p) }
    }

  /** Integer-exact stationary distribution of the pooled per-key
    * state-transition chain. */
  private[graft] def markovStationary(df: DataFrame, keyCol: String,
                                      stateCol: String, tsCol: String,
                                      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    val trans = df
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev"), col(stateCol).as("__next"))
      .agg(count(lit(1)).as("__c"))
    val states = df.select(col(stateCol).as("__s")).distinct()
    val packed = states.agg(sort_array(collect_list(col("__s"))).as("__states"))
      .crossJoin(trans.agg(sort_array(collect_list(
        struct(col("__prev"), col("__next"), col("__c")))).as("__t")))
    val folded = packed.select(explode(mkFold(col("__states"),
        transform(col("__t"), x => x.getField("__prev")),
        transform(col("__t"), x => x.getField("__next")),
        transform(col("__t"), x => x.getField("__c")))).as("r"))
      .select(col("r._1").as("state"), col("r._2").as("pi_int"))
    folded
      .withColumn("__tot", sum(col("pi_int")).over(Window.partitionBy()))
      .select(col("state"), col("pi_int"),
        (col("pi_int").cast("double") / col("__tot").cast("double"))
          .as("pi"))
      .orderBy(col("state").asc)
  }

  /** Supplier-side projection of the supplier–part graph: top pairs by
    * shared parts. Pair generation is per part (Σ_p deg(p)² pairs), and
    * parts hotter than `maxPartDeg` suppliers are EXCLUDED from it — the
    * hub-removal / stop-word discipline of co-occurrence mining (a part
    * stocked by 10⁵ suppliers says nothing about any pair, but emits
    * 5·10⁹ rows). With the cap, pair volume is bounded by
    * |parts| · maxPartDeg² / 2 — linear in parts, never quadratic in a
    * hot key's degree; dropped-signal bound: each excluded part removes
    * at most deg(p)²/2 pairs, every one carrying < 1/maxPartDeg of that
    * part's idf-like weight. The synthetic TPC-H-ish data saturates near
    * deg ≈ 52 at sf0.1 (≈ 60 at sf1), so 256 is hash-neutral at every
    * test scale while still killing the 100 TB hot-key blowup. Supplier
    * degrees (the Jaccard denominator) stay UNcapped — the cap only
    * gates which parts may nominate pairs. */
  private[graft] def bipartiteProj(lineitem: DataFrame,
                                   minShared: Int = BpMinShared,
                                   topN: Int = BpTopN,
                                   maxPartDeg: Int = BpMaxPartDeg): DataFrame = {
    val e = lineitem.select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
      .distinct()
    val deg = e.groupBy(col("s")).agg(count(lit(1)).as("deg"))
    val coolParts = e.groupBy(col("p")).agg(count(lit(1)).as("__pd"))
      .filter(col("__pd") <= maxPartDeg)
      .select(col("p"))
    val ec = e.join(coolParts, Seq("p"), "left_semi")
    val pairs = ec.select(col("p"), col("s").as("id_a"))
      .join(ec.select(col("p"), col("s").as("id_b")), Seq("p"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    pairs
      .join(deg.select(col("s").as("id_a"), col("deg").as("__da")), "id_a")
      .join(deg.select(col("s").as("id_b"), col("deg").as("__db")), "id_b")
      .select(col("id_a"), col("id_b"), col("shared"),
        (col("shared").cast("double") /
          (col("__da") + col("__db") - col("shared")).cast("double"))
          .as("jaccard"))
      .orderBy(col("shared").desc, col("jaccard").desc,
        col("id_a").asc, col("id_b").asc)
      .limit(topN)
  }

  /** Degree histogram of both sides of the supplier–part graph. */
  private[graft] def degreeHist(lineitem: DataFrame): DataFrame = {
    val e = lineitem.select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
      .distinct()
    val sup = e.groupBy(col("s")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      .withColumn("side", lit("supplier"))
    val part = e.groupBy(col("p")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      .withColumn("side", lit("part"))
    sup.unionAll(part)
      .select(col("side"), col("degree"), col("n_nodes"))
      .orderBy(col("side").asc, col("degree").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_markov_stationary" -> ((s, dir) =>
      markovStationary(Tables.events(s, dir), "user_id", "event_type",
        "ts", "event_id")),
    "q_bipartite_proj" -> ((s, dir) => bipartiteProj(Tables.lineitem(s, dir))),
    "q_degree_hist" -> ((s, dir) => degreeHist(Tables.lineitem(s, dir))))

  /** Unrolled integer power-iteration CTE chain. */
  private def mkSteps: String = (1 to MkIters).map { i =>
    s""",
       |d$i AS MATERIALIZED (SELECT COALESCE(CAST(sum(pi // (SELECT n FROM meta)) AS BIGINT), 0) AS dang
       |  FROM r${i - 1} LEFT JOIN rs ON state = prev WHERE rsum IS NULL),
       |c$i AS MATERIALIZED (SELECT t.next AS state, CAST(sum((p.pi * t.c) // r.rsum) AS BIGINT) AS s
       |  FROM r${i - 1} p JOIN rs r ON p.state = r.prev JOIN trans t ON t.prev = p.state
       |  GROUP BY t.next),
       |r$i AS MATERIALIZED (SELECT st.state, COALESCE(c.s, 0) + (SELECT dang FROM d$i) AS pi
       |  FROM states st LEFT JOIN c$i c ON st.state = c.state)""".stripMargin
  }.mkString

  val oracle: Map[String, String] = Map(
    "q_markov_stationary" ->
      s"""WITH seq AS MATERIALIZED (
         |  SELECT event_type,
         |    lag(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS prev
         |  FROM events),
         |trans AS MATERIALIZED (
         |  SELECT prev, event_type AS next, CAST(count(*) AS BIGINT) AS c
         |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
         |states AS MATERIALIZED (SELECT DISTINCT event_type AS state
         |  FROM events),
         |rs AS MATERIALIZED (SELECT prev, CAST(sum(c) AS BIGINT) AS rsum
         |  FROM trans GROUP BY 1),
         |meta AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n
         |  FROM states),
         |r0 AS (SELECT state, CAST($MkScale AS BIGINT) AS pi FROM states)$mkSteps
         |SELECT state, CAST(pi AS BIGINT) AS pi_int,
         |  CAST(pi AS DOUBLE) / CAST((SELECT sum(pi) FROM r$MkIters) AS DOUBLE)
         |    AS pi
         |FROM r$MkIters ORDER BY state""".stripMargin,

    "q_bipartite_proj" ->
      s"""WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
         |  FROM lineitem),
         |deg AS (SELECT s, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
         |cool AS (SELECT p FROM e GROUP BY p
         |  HAVING count(*) <= $BpMaxPartDeg),
         |ec AS (SELECT * FROM e WHERE p IN (SELECT p FROM cool)),
         |pairs AS (
         |  SELECT a.s AS id_a, b.s AS id_b, CAST(count(*) AS BIGINT) AS shared
         |  FROM ec a JOIN ec b ON a.p = b.p AND a.s < b.s
         |  GROUP BY 1, 2 HAVING count(*) >= $BpMinShared)
         |SELECT id_a, id_b, shared,
         |  CAST(shared AS DOUBLE)
         |    / CAST(da.deg + db.deg - shared AS DOUBLE) AS jaccard
         |FROM pairs
         |JOIN deg da ON id_a = da.s
         |JOIN deg db ON id_b = db.s
         |ORDER BY shared DESC, jaccard DESC, id_a, id_b
         |LIMIT $BpTopN""".stripMargin,

    "q_degree_hist" ->
      """WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
        |  FROM lineitem),
        |sup AS (
        |  SELECT 'supplier' AS side, degree, CAST(count(*) AS BIGINT)
        |      AS n_nodes
        |  FROM (SELECT s, CAST(count(*) AS BIGINT) AS degree
        |        FROM e GROUP BY 1)
        |  GROUP BY 1, 2),
        |prt AS (
        |  SELECT 'part' AS side, degree, CAST(count(*) AS BIGINT) AS n_nodes
        |  FROM (SELECT p, CAST(count(*) AS BIGINT) AS degree
        |        FROM e GROUP BY 1)
        |  GROUP BY 1, 2)
        |SELECT side, degree, n_nodes FROM (
        |  SELECT * FROM sup UNION ALL SELECT * FROM prt)
        |ORDER BY side, degree""".stripMargin)
}
