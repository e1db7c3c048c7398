package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hundred-fifty-second wave — the PRIVACY-GOVERNANCE audit pair:
  * k-anonymity and l-diversity over a quasi-identifier, the release
  * checklist a dataset goes through before documents (or user
  * telemetry) leave the warehouse. The quasi-identifier is
  * (source, n_chars length-decile) — the attacker-observable tuple —
  * and the sensitive attribute is `lang`.
  *
  *  - **q_k_anonymity**: the equivalence-class size histogram — for
  *    each class size bucket (1, 2-4, 5-9, 10+), how many classes and
  *    rows fall there, plus the dataset's k (the MINIMUM class size:
  *    any class of size 1 is a re-identification).
  *  - **q_l_diversity**: per-class distinct sensitive values — the
  *    dataset's l (minimum distinct langs over classes) and the share
  *    of rows in classes with l = 1 (attribute disclosure even at
  *    k > 1: everyone in the class shares the secret).
  *
  * Exact-parity discipline: the length decile is an integer rank
  * bucket — ntile is engine-divergent on ties, so deciles come from
  * the EXACT rank formula bucket = ((rank−1)·10) div n with rank =
  * row_number over (n_chars, doc_id) (a total order, bit-identical
  * both engines); every emitted number is a count or an integer
  * minimum; shares are one count/count division.
  *
  * Scale shape: one rank window over the corpus order (at 100 TB the
  * decile boundary comes from approx_percentile or a 2-pass count
  * histogram — documented swap; the rank form is the gate-SF exact
  * twin), then hash aggregates on the QI tuple — partial-aggregate
  * shuffles only.
  */
object Breadth151 {

  /** Rows tagged with the QI tuple (source, len_decile). */
  private[graft] def qiClasses(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    val n = docs.agg(count(lit(1)).as("__n"))
    docs.select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"))
      .withColumn("__rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(n))
      .withColumn("len_decile",
        expr("((__rk - 1) * 10) div __n"))
      .select(col("doc_id"), col("source"), col("lang"),
        col("len_decile"))
  }

  /** Class-size histogram + the dataset k. */
  private[graft] def kAnonymity(docs: DataFrame): DataFrame = {
    val cls = qiClasses(docs)
      .groupBy(col("source"), col("len_decile"))
      .agg(count(lit(1)).as("__sz"))
    val kMin = cls.agg(min(col("__sz")).as("__k"))
    cls.select(
        when(col("__sz") === 1, "1")
          .when(col("__sz") <= 4, "2-4")
          .when(col("__sz") <= 9, "5-9")
          .otherwise("10+").as("size_bucket"),
        col("__sz"))
      .groupBy(col("size_bucket"))
      .agg(count(lit(1)).as("n_classes"), sum(col("__sz")).as("n_rows"))
      .crossJoin(broadcast(kMin))
      .select(col("size_bucket"), col("n_classes"), col("n_rows"),
        col("__k").as("k_anonymity"))
      .orderBy(col("size_bucket").asc)
  }

  /** The dataset l + the share of rows in attribute-disclosing
    * (l = 1) classes. */
  private[graft] def lDiversity(docs: DataFrame): DataFrame =
    qiClasses(docs)
      .groupBy(col("source"), col("len_decile"))
      .agg(count(lit(1)).as("__sz"),
        count_distinct(col("lang")).as("__l"))
      .agg(count(lit(1)).as("n_classes"),
        min(col("__l")).as("l_diversity"),
        sum(col("__sz")).as("__n"),
        sum(when(col("__l") === 1, col("__sz")).otherwise(0L))
          .as("n_disclosed"))
      .select(col("n_classes"), col("l_diversity"), col("n_disclosed"),
        (col("n_disclosed").cast("double") / col("__n").cast("double"))
          .as("disclosed_share"))

  val defs: Map[String, Q] = Map(
    "q_k_anonymity" -> ((s, dir) => kAnonymity(Tables.documents(s, dir))),
    "q_l_diversity" -> ((s, dir) => lDiversity(Tables.documents(s, dir))))

  /** QI-class CTE chain (no leading WITH), shared. */
  private val QiSql: String =
    s"""nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |qi AS (
       |  SELECT doc_id, source, lang,
       |    ((CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
       |      - 1) * 10) // nn.n AS len_decile
       |  FROM documents CROSS JOIN nn),
       |cl AS (
       |  SELECT source, len_decile, CAST(count(*) AS BIGINT) AS sz,
       |    CAST(count(DISTINCT lang) AS BIGINT) AS l
       |  FROM qi GROUP BY source, len_decile)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_k_anonymity" ->
      s"""WITH $QiSql,
         |km AS (SELECT CAST(min(sz) AS BIGINT) AS k FROM cl)
         |SELECT CASE WHEN sz = 1 THEN '1' WHEN sz <= 4 THEN '2-4'
         |    WHEN sz <= 9 THEN '5-9' ELSE '10+' END AS size_bucket,
         |  CAST(count(*) AS BIGINT) AS n_classes,
         |  CAST(sum(sz) AS BIGINT) AS n_rows,
         |  km.k AS k_anonymity
         |FROM cl CROSS JOIN km
         |GROUP BY 1, km.k
         |ORDER BY size_bucket""".stripMargin,

    "q_l_diversity" ->
      s"""WITH $QiSql
         |SELECT CAST(count(*) AS BIGINT) AS n_classes,
         |  CAST(min(l) AS BIGINT) AS l_diversity,
         |  CAST(sum(CASE WHEN l = 1 THEN sz ELSE 0 END) AS BIGINT)
         |    AS n_disclosed,
         |  CAST(sum(CASE WHEN l = 1 THEN sz ELSE 0 END) AS DOUBLE)
         |    / CAST(sum(sz) AS DOUBLE) AS disclosed_share
         |FROM cl""".stripMargin)
}
