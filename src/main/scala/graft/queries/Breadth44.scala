package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Forty-fifth wave — the count–min sketch as a query.
  *
  * The fixed-size frequency sketch is the scale path for "how often
  * does key X appear" over streams too large to hold exact counts:
  * d hash rows × w buckets of counters, increment all d on arrival,
  * estimate = min over rows — never an undercount, overcount bounded
  * by ‖f‖₁·e/w with probability 1−e^(−d). Two queries:
  *
  *  - **q_count_min**: build a d=4 × w=64 sketch over event key
  *    arrivals, then read back the 10 hottest keys: true count, sketch
  *    estimate, overestimate. The build is ONE map-side-combinable
  *    aggregate into 256 cells (the sketch merges associatively — the
  *    map-combine IS the distributed sketch union, the property that
  *    makes CMS work on a 1000-executor stream); the probe join is a
  *    broadcast of 40 (row, bucket) lookups against the 256-cell table.
  *  - **q_cms_width_curve**: the tuning curve — the same sketch at
  *    w ∈ {16, 64, 256}, reporting per-width total/mean/max
  *    overestimate across ALL keys. Error halves per width doubling
  *    (ε = e/w); the curve is what sizes the sketch for a target error
  *    at production cardinalities.
  *
  * Hashes are Carter–Wegman modular: h_i(x) = ((aᵢ·x + bᵢ) mod P)
  * mod w with P = 2³¹−1 — pure BIGINT arithmetic both engines evaluate
  * identically. The aᵢ are ~2³⁰-sized ON PURPOSE: with small
  * multipliers aᵢ·x never reaches P, the mod-P is the identity, and
  * the "d independent rows" all degenerate to (aᵢx+b) mod w — keys in
  * the same residue class mod w then collide in EVERY row and the min
  * buys nothing (measured live on the first cut of this query).
  * Large aᵢ force genuine wraparound so the rows decorrelate; aᵢ·x
  * stays under 2⁶³ for keys up to ~4·10⁹. Every output is an exact
  * integer or one division of two exact integers — no rounding. */
object Breadth44 {

  private[graft] val CmsP = 2147483647L // 2^31 - 1, Mersenne prime
  private[graft] val CmsHashes: Seq[(Long, Long)] =
    Seq((1580030173L, 718157081L), (1112103618L, 351252209L),
      (1993977148L, 1863979817L), (733124023L, 94723991L))
  private[graft] val CmsW = 64
  private[graft] val CmsTopN = 10
  private[graft] val CurveWidths = Seq(16, 64, 256)

  private def bucket(key: Column, a: Long, b: Long, w: Int): Column =
    ((lit(a) * key + lit(b)) % CmsP) % w

  /** Per-key exact arrival counts — the stream the sketch summarizes
    * and the ground truth it is scored against. */
  private[graft] def keyCounts(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("true_cnt"))

  /** The d×w cell table: one aggregate over (row, bucket). Building
    * from per-key counts is equivalent to per-arrival increments (the
    * sketch is linear) and shuffles |keys| rows, not |events|. */
  private[graft] def cmsCells(counts: DataFrame, w: Int): DataFrame = {
    val rb = CmsHashes.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("row"), bucket(col("key"), a, b, w).as("bucket"))
    }
    counts.select(explode(array(rb: _*)).as("__rb"), col("true_cnt"))
      .groupBy(col("__rb.row").as("row"), col("__rb.bucket").as("bucket"))
      .agg(sum(col("true_cnt")).as("cell"))
  }

  /** Point estimates: min over the d cells each key hashes into. */
  private[graft] def cmsEstimates(probes: DataFrame, cells: DataFrame,
                                  w: Int): DataFrame = {
    val rb = CmsHashes.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("row"), bucket(col("key"), a, b, w).as("bucket"))
    }
    probes.select(col("key"), col("true_cnt"),
        explode(array(rb: _*)).as("__rb"))
      .select(col("key"), col("true_cnt"),
        col("__rb.row").as("row"), col("__rb.bucket").as("bucket"))
      .join(broadcast(cells), Seq("row", "bucket"))
      .groupBy(col("key"), col("true_cnt"))
      .agg(min(col("cell")).as("cms_est"))
  }

  private[graft] def countMin(df: DataFrame, keyCol: String): DataFrame = {
    val counts = keyCounts(df, keyCol)
    val cells = cmsCells(counts, CmsW)
    val probes = counts
      .orderBy(col("true_cnt").desc, col("key").asc).limit(CmsTopN)
    cmsEstimates(probes, cells, CmsW)
      .select(col("key").as("user_id"), col("true_cnt"),
        col("cms_est"), (col("cms_est") - col("true_cnt")).as("overest"))
      .orderBy(col("true_cnt").desc, col("user_id").asc)
  }

  private[graft] def widthCurve(df: DataFrame, keyCol: String): DataFrame = {
    val counts = keyCounts(df, keyCol)
    CurveWidths.map { w =>
      cmsEstimates(counts, cmsCells(counts, w), w)
        .agg(count(lit(1)).as("n_keys"),
          sum(col("cms_est") - col("true_cnt")).as("total_overest"),
          max(col("cms_est") - col("true_cnt")).as("max_overest"))
        .select(lit(w).as("width"), col("n_keys"), col("total_overest"),
          (col("total_overest").cast("double") /
            col("n_keys").cast("double")).as("mean_overest"),
          col("max_overest"))
    }.reduce(_ unionAll _).orderBy(col("width").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_count_min" -> ((s, dir) =>
      countMin(Tables.events(s, dir), "user_id")),
    "q_cms_width_curve" -> ((s, dir) =>
      widthCurve(Tables.events(s, dir), "user_id")))

  /** (row, a, b) hash-parameter rows as a SQL VALUES list. */
  private val hashRowsSql: String = CmsHashes.zipWithIndex
    .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")

  private def cellsSql(w: Int): String =
    s"""SELECT h.row AS row,
       |    ((h.a * c.key + h.b) % $CmsP) % $w AS bucket,
       |    CAST(sum(c.true_cnt) AS BIGINT) AS cell
       |  FROM counts c CROSS JOIN (
       |    SELECT * FROM (VALUES $hashRowsSql) AS t(row, a, b)) h
       |  GROUP BY 1, 2""".stripMargin

  private def estSql(w: Int): String =
    s"""SELECT c.key, c.true_cnt, min(cl.cell) AS cms_est
       |  FROM counts c CROSS JOIN (
       |    SELECT * FROM (VALUES $hashRowsSql) AS t(row, a, b)) h
       |  JOIN cells_$w cl ON cl.row = h.row
       |    AND cl.bucket = ((h.a * c.key + h.b) % $CmsP) % $w
       |  GROUP BY c.key, c.true_cnt""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_count_min" ->
      s"""WITH counts AS (
         |  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS true_cnt
         |  FROM events GROUP BY 1),
         |cells_$CmsW AS (${cellsSql(CmsW)}),
         |est AS (${estSql(CmsW)})
         |SELECT e.key AS user_id, e.true_cnt, e.cms_est,
         |  e.cms_est - e.true_cnt AS overest
         |FROM est e
         |JOIN (SELECT key FROM counts
         |      ORDER BY true_cnt DESC, key LIMIT $CmsTopN) p
         |  ON p.key = e.key
         |ORDER BY true_cnt DESC, user_id""".stripMargin,

    "q_cms_width_curve" ->
      s"""WITH counts AS (
         |  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS true_cnt
         |  FROM events GROUP BY 1),
         |${CurveWidths.map(w => s"cells_$w AS (${cellsSql(w)})")
            .mkString(",\n")},
         |${CurveWidths.map(w => s"est_$w AS (${estSql(w)})")
            .mkString(",\n")}
         |${CurveWidths.map(w =>
           s"""SELECT $w AS width, CAST(count(*) AS BIGINT) AS n_keys,
              |  CAST(sum(cms_est - true_cnt) AS BIGINT) AS total_overest,
              |  CAST(sum(cms_est - true_cnt) AS DOUBLE)
              |    / CAST(count(*) AS DOUBLE) AS mean_overest,
              |  CAST(max(cms_est - true_cnt) AS BIGINT) AS max_overest
              |FROM est_$w""".stripMargin).mkString("\nUNION ALL\n")}
         |ORDER BY width""".stripMargin)
}
