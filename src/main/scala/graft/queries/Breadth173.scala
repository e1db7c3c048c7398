package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-seventy-fourth wave — the two TWO-SAMPLE tests the
  * location/shape tier still lacked (Mann–Whitney, Anderson–Darling,
  * Wasserstein-1, KS drift all exist), comparing English vs non-
  * English document lengths:
  *
  *  - **q_cvm**: the two-sample Cramér–von Mises statistic — the
  *    rank-based T = U/(nm·N) − (4nm−1)/(6N), U = n·Σ(r_i−i)² +
  *    m·Σ(s_j−j)², integrating squared ECDF gaps over the WHOLE
  *    support (where KS sees only the max gap). Ranks are taken on
  *    the deterministic total order (n_chars, doc_id) — the
  *    documented tie-broken variant, identical in both engines.
  *  - **q_mood_median**: Mood's median test — the 2×2 of (group ×
  *    above/below the pooled rank median) with its χ², the blunt but
  *    assumption-free location test.
  *
  * Exact-parity discipline: ranks, gaps, and U are exact BIGINTs
  * (U ≤ 2·N³ ≈ 2.5e14 at sf0.1 — int64 headroom to N ≈ 2e6 docs; the
  * Mood cell products (a+b)(c+d) ≤ N²/... the χ² numerator squares
  * (ad−bc) in DOUBLE deliberately — past 2⁵³ it rounds, identically
  * in both engines since operand order matches); both statistics are
  * divisions/subtractions of exactly-agreed values.
  *
  * Scale shape: one global rank window (documented approx-rank swap
  * at 100 TB), two per-group running counters, one aggregate. No
  * joins, no quadratic path.
  */
object Breadth173 {

  /** Pooled ranks + per-group ordinals (internal). */
  private[graft] def ranked(docs: DataFrame): DataFrame = {
    val total = Window.orderBy(col("n_chars").asc, col("doc_id").asc)
    val byGrp = Window.partitionBy(col("__g"))
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    docs
      .select(col("doc_id"), col("n_chars"),
        when(col("lang") === "en", lit(1L)).otherwise(lit(0L)).as("__g"))
      .withColumn("__r", row_number().over(total).cast("long"))
      .withColumn("__i", row_number().over(byGrp).cast("long"))
  }

  /** Two-sample Cramér–von Mises (tie-broken variant). */
  private[graft] def cvm(docs: DataFrame): DataFrame =
    ranked(docs)
      .select(col("__g"),
        ((col("__r") - col("__i")) * (col("__r") - col("__i")))
          .as("__d2"))
      .groupBy()
      .agg(sum(when(col("__g") === 1, 1L).otherwise(0L)).as("n_en"),
        sum(when(col("__g") === 0, 1L).otherwise(0L)).as("m_other"),
        sum(when(col("__g") === 1, col("__d2")).otherwise(0L)).as("__sx"),
        sum(when(col("__g") === 0, col("__d2")).otherwise(0L)).as("__sy"))
      .select(col("n_en"), col("m_other"),
        (col("n_en") * col("__sx") + col("m_other") * col("__sy"))
          .as("u_stat"),
        ((col("n_en") * col("__sx") + col("m_other") * col("__sy"))
          .cast("double") /
          (col("n_en") * col("m_other") * (col("n_en") + col("m_other")))
            .cast("double") -
          (lit(4L) * col("n_en") * col("m_other") - 1).cast("double") /
            (lit(6L) * (col("n_en") + col("m_other"))).cast("double"))
          .as("cvm_t"))

  /** Mood's median test on the pooled rank median. */
  private[graft] def moodMedian(docs: DataFrame): DataFrame = {
    val r = ranked(docs)
    val n = r.agg(count(lit(1)).as("__n"))
    r.crossJoin(broadcast(n))
      .select(col("__g"),
        (col("__r") > expr("(__n + 1) div 2")).as("__above"))
      .agg(
        sum(when(col("__g") === 1 && col("__above"), 1L).otherwise(0L))
          .as("a"),
        sum(when(col("__g") === 1 && !col("__above"), 1L).otherwise(0L))
          .as("b"),
        sum(when(col("__g") === 0 && col("__above"), 1L).otherwise(0L))
          .as("c"),
        sum(when(col("__g") === 0 && !col("__above"), 1L).otherwise(0L))
          .as("d"))
      .select(col("a"), col("b"), col("c"), col("d"),
        when((col("a") + col("b")) * (col("c") + col("d")) === 0 ||
          (col("a") + col("c")) * (col("b") + col("d")) === 0, lit(null))
          .otherwise(
            (col("a") + col("b") + col("c") + col("d")).cast("double") *
              ((col("a") * col("d") - col("b") * col("c")).cast("double") *
                (col("a") * col("d") - col("b") * col("c"))
                  .cast("double")) /
              (((col("a") + col("b")) * (col("c") + col("d")))
                .cast("double") *
                ((col("a") + col("c")) * (col("b") + col("d")))
                  .cast("double"))).as("chi2"))
  }

  val defs: Map[String, Q] = Map(
    "q_cvm" -> ((s, dir) => cvm(Tables.documents(s, dir))),
    "q_mood_median" -> ((s, dir) => moodMedian(Tables.documents(s, dir))))

  /** Ranked CTE (no leading WITH), shared. */
  private val RankSql: String =
    """rk AS (
      |  SELECT CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
      |      ELSE CAST(0 AS BIGINT) END AS g,
      |    CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
      |      AS r,
      |    CAST(row_number() OVER (PARTITION BY (lang = 'en')
      |      ORDER BY n_chars, doc_id) AS BIGINT) AS i
      |  FROM documents)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_cvm" ->
      s"""WITH $RankSql,
         |ag AS (
         |  SELECT
         |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS m,
         |    CAST(sum(CASE WHEN g = 1 THEN (r - i) * (r - i)
         |      ELSE 0 END) AS BIGINT) AS sx,
         |    CAST(sum(CASE WHEN g = 0 THEN (r - i) * (r - i)
         |      ELSE 0 END) AS BIGINT) AS sy
         |  FROM rk)
         |SELECT n AS n_en, m AS m_other,
         |  CAST(n * sx + m * sy AS BIGINT) AS u_stat,
         |  CAST(n * sx + m * sy AS DOUBLE)
         |      / CAST(n * m * (n + m) AS DOUBLE)
         |    - CAST(4 * n * m - 1 AS DOUBLE)
         |      / CAST(6 * (n + m) AS DOUBLE) AS cvm_t
         |FROM ag""".stripMargin,

    "q_mood_median" ->
      s"""WITH $RankSql,
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rk),
         |cells AS (
         |  SELECT
         |    CAST(sum(CASE WHEN g = 1 AND r > (nn.n + 1) // 2
         |      THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |    CAST(sum(CASE WHEN g = 1 AND r <= (nn.n + 1) // 2
         |      THEN 1 ELSE 0 END) AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN g = 0 AND r > (nn.n + 1) // 2
         |      THEN 1 ELSE 0 END) AS BIGINT) AS c,
         |    CAST(sum(CASE WHEN g = 0 AND r <= (nn.n + 1) // 2
         |      THEN 1 ELSE 0 END) AS BIGINT) AS d
         |  FROM rk CROSS JOIN nn)
         |SELECT a, b, c, d,
         |  CASE WHEN (a + b) * (c + d) = 0 OR (a + c) * (b + d) = 0
         |    THEN NULL
         |    ELSE CAST(a + b + c + d AS DOUBLE)
         |      * (CAST(a * d - b * c AS DOUBLE)
         |        * CAST(a * d - b * c AS DOUBLE))
         |      / (CAST((a + b) * (c + d) AS DOUBLE)
         |        * CAST((a + c) * (b + d) AS DOUBLE)) END AS chi2
         |FROM cells""".stripMargin)
}
