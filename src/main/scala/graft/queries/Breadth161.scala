package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-sixty-second wave — ASSOCIATION between low-cardinality
  * columns, the two families the repo's correlation tier (Pearson/
  * Spearman/Kendall/Chatterjee, all over continuous series) does not
  * cover:
  *
  *  - **q_ordinal_assoc**: Goodman–Kruskal gamma, both Somers' D
  *    asymmetries, and Kendall tau-b between order priority (ordinal
  *    1..5, parsed from the leading digit) and the total-price rank
  *    quintile. Unlike wave 26's tau-a (tie-free day ranks), these are
  *    the TIE-AWARE statistics — on a 5×5 grid almost every pair is
  *    tied somewhere, and gamma/D/tau-b differ exactly in which tied
  *    pairs enter the denominator.
  *  - **q_theil_u**: the uncertainty coefficient U(lang|source) and
  *    U(source|lang) over documents — the asymmetric, information-
  *    theoretic cousin of Cramér's V (wave ~30): how much knowing the
  *    source shrinks lang entropy. U = MI / H(target).
  *
  * Exact-parity discipline: concordant/discordant/tied pair counts
  * come from the CONTINGENCY-CELL self-join — Σ n_a·n_b over cell
  * pairs, exact BIGINTs (≤ n² ≈ 2.25e10 at sf0.1; int64 headroom to
  * n ≈ 3e9 rows); gamma/D are one double division, tau-b divides by
  * sqrt(a)·sqrt(b) (sqrt is IEEE-correctly-rounded — bit-equal
  * cross-engine; a·b would overflow int64, the two-root form never
  * materializes the product). Entropy/MI terms follow the WOE
  * discipline: ln of ONE exact-integer-product division, rounded 6 dp,
  * then per-cell terms quantized to integer 1e-9 units before the
  * order-free BIGINT sum.
  *
  * Scale shape: one hash aggregate to the 5×5 (or |sources|×|langs|)
  * cell table, then a metadata-sized cell self-join — the pair
  * statistics never touch row pairs. The quintile rank window has the
  * documented approx-quantile swap at 100 TB (wave 152 stance).
  */
object Breadth161 {

  /** Contingency cells: priority ordinal × price quintile. */
  private[graft] def cells(orders: DataFrame): DataFrame = {
    val w = Window.orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val n = orders.agg(count(lit(1)).as("__n"))
    orders
      .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("x"),
        col("o_totalprice"), col("o_orderkey"))
      .withColumn("__rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(n))
      .withColumn("y", expr("((__rk - 1) * 5) div __n"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n"))
  }

  /** Tie-aware ordinal association statistics. */
  private[graft] def ordinalAssoc(orders: DataFrame): DataFrame = {
    val c = cells(orders)
    val a = c.select(col("x").as("__xa"), col("y").as("__ya"),
      col("n").as("__na"))
    val b = c.select(col("x").as("__xb"), col("y").as("__yb"),
      col("n").as("__nb"))
    val agg = a.crossJoin(b).agg(
      sum(when(col("__xb") > col("__xa") && col("__yb") > col("__ya"),
        col("__na") * col("__nb")).otherwise(0L)).as("c_pairs"),
      sum(when(col("__xb") > col("__xa") && col("__yb") < col("__ya"),
        col("__na") * col("__nb")).otherwise(0L)).as("d_pairs"),
      sum(when(col("__yb") === col("__ya") && col("__xb") > col("__xa"),
        col("__na") * col("__nb")).otherwise(0L)).as("ty_pairs"),
      sum(when(col("__xb") === col("__xa") && col("__yb") > col("__ya"),
        col("__na") * col("__nb")).otherwise(0L)).as("tx_pairs"))
    val cd = col("c_pairs") + col("d_pairs")
    agg.select(col("c_pairs"), col("d_pairs"), col("ty_pairs"),
      col("tx_pairs"),
      when(cd === 0, lit(null)).otherwise(
        (col("c_pairs") - col("d_pairs")).cast("double") /
          cd.cast("double")).as("gamma"),
      when(cd + col("ty_pairs") === 0, lit(null)).otherwise(
        (col("c_pairs") - col("d_pairs")).cast("double") /
          (cd + col("ty_pairs")).cast("double")).as("somers_d_yx"),
      when(cd + col("tx_pairs") === 0, lit(null)).otherwise(
        (col("c_pairs") - col("d_pairs")).cast("double") /
          (cd + col("tx_pairs")).cast("double")).as("somers_d_xy"),
      when(cd + col("tx_pairs") === 0 || cd + col("ty_pairs") === 0,
        lit(null)).otherwise(
        (col("c_pairs") - col("d_pairs")).cast("double") /
          (sqrt((cd + col("tx_pairs")).cast("double")) *
            sqrt((cd + col("ty_pairs")).cast("double")))).as("tau_b"))
  }

  /** Theil's U between source and lang (both directions) + MI. */
  private[graft] def theilU(docs: DataFrame): DataFrame = {
    val cell = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("__c"))
    // rename the join keys on the aggregate sides — a groupBy joined
    // back to its own source frame trips DetectAmbiguousSelfJoin
    val bySrc = cell.groupBy(col("source")).agg(sum(col("__c")).as("__cs"))
      .select(col("source").as("__s2"), col("__cs"))
    val byLang = cell.groupBy(col("lang")).agg(sum(col("__c")).as("__cl"))
      .select(col("lang").as("__l2"), col("__cl"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val joined = cell
      .join(broadcast(bySrc), col("source") === col("__s2"))
      .join(broadcast(byLang), col("lang") === col("__l2"))
      .crossJoin(broadcast(n))
    val miTerm = floor(col("__c") *
      round(log((col("__c") * col("__n")).cast("double") /
        (col("__cs") * col("__cl")).cast("double")), 6) *
      lit(1.0e9) + lit(0.5)).cast("long")
    val hlTerm = floor(col("__cl") *
      round(log(col("__n").cast("double") / col("__cl").cast("double")), 6) *
      lit(1.0e9) + lit(0.5)).cast("long")
    val hsTerm = floor(col("__cs") *
      round(log(col("__n").cast("double") / col("__cs").cast("double")), 6) *
      lit(1.0e9) + lit(0.5)).cast("long")
    val mi = joined.agg(sum(miTerm).as("__mi"), first(col("__n")).as("__n"))
      .select((col("__mi").cast("double") /
        (col("__n") * lit(1000000000L)).cast("double")).as("mi"))
    val hl = byLang.select(col("__cl")).crossJoin(broadcast(n))
      .agg(sum(hlTerm).as("__h"), first(col("__n")).as("__n"))
      .select((col("__h").cast("double") /
        (col("__n") * lit(1000000000L)).cast("double")).as("h_lang"))
    val hs = bySrc.select(col("__cs")).crossJoin(broadcast(n))
      .agg(sum(hsTerm).as("__h"), first(col("__n")).as("__n"))
      .select((col("__h").cast("double") /
        (col("__n") * lit(1000000000L)).cast("double")).as("h_source"))
    mi.crossJoin(hl).crossJoin(hs)
      .select(col("mi"), col("h_lang"), col("h_source"),
        when(col("h_lang") === 0.0, lit(null))
          .otherwise(col("mi") / col("h_lang")).as("u_lang_given_source"),
        when(col("h_source") === 0.0, lit(null))
          .otherwise(col("mi") / col("h_source")).as("u_source_given_lang"))
  }

  val defs: Map[String, Q] = Map(
    "q_ordinal_assoc" -> ((s, dir) => ordinalAssoc(Tables.orders(s, dir))),
    "q_theil_u" -> ((s, dir) => theilU(Tables.documents(s, dir))))

  val oracle: Map[String, String] = Map(
    "q_ordinal_assoc" ->
      """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
        |pts AS (
        |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS x,
        |    ((CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey)
        |      AS BIGINT) - 1) * 5) // nn.n AS y
        |  FROM orders CROSS JOIN nn),
        |cl AS (
        |  SELECT x, y, CAST(count(*) AS BIGINT) AS n
        |  FROM pts GROUP BY x, y),
        |ag AS (
        |  SELECT
        |    CAST(sum(CASE WHEN b.x > a.x AND b.y > a.y
        |      THEN a.n * b.n ELSE 0 END) AS BIGINT) AS c_pairs,
        |    CAST(sum(CASE WHEN b.x > a.x AND b.y < a.y
        |      THEN a.n * b.n ELSE 0 END) AS BIGINT) AS d_pairs,
        |    CAST(sum(CASE WHEN b.y = a.y AND b.x > a.x
        |      THEN a.n * b.n ELSE 0 END) AS BIGINT) AS ty_pairs,
        |    CAST(sum(CASE WHEN b.x = a.x AND b.y > a.y
        |      THEN a.n * b.n ELSE 0 END) AS BIGINT) AS tx_pairs
        |  FROM cl a CROSS JOIN cl b)
        |SELECT c_pairs, d_pairs, ty_pairs, tx_pairs,
        |  CASE WHEN c_pairs + d_pairs = 0 THEN NULL
        |    ELSE CAST(c_pairs - d_pairs AS DOUBLE)
        |      / CAST(c_pairs + d_pairs AS DOUBLE) END AS gamma,
        |  CASE WHEN c_pairs + d_pairs + ty_pairs = 0 THEN NULL
        |    ELSE CAST(c_pairs - d_pairs AS DOUBLE)
        |      / CAST(c_pairs + d_pairs + ty_pairs AS DOUBLE) END
        |    AS somers_d_yx,
        |  CASE WHEN c_pairs + d_pairs + tx_pairs = 0 THEN NULL
        |    ELSE CAST(c_pairs - d_pairs AS DOUBLE)
        |      / CAST(c_pairs + d_pairs + tx_pairs AS DOUBLE) END
        |    AS somers_d_xy,
        |  CASE WHEN c_pairs + d_pairs + tx_pairs = 0
        |      OR c_pairs + d_pairs + ty_pairs = 0 THEN NULL
        |    ELSE CAST(c_pairs - d_pairs AS DOUBLE)
        |      / (sqrt(CAST(c_pairs + d_pairs + tx_pairs AS DOUBLE))
        |        * sqrt(CAST(c_pairs + d_pairs + ty_pairs AS DOUBLE))) END
        |    AS tau_b
        |FROM ag""".stripMargin,

    "q_theil_u" ->
      """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |cell AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY source, lang),
        |bs AS (SELECT source, CAST(sum(c) AS BIGINT) AS cs
        |  FROM cell GROUP BY source),
        |bl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS cl2
        |  FROM cell GROUP BY lang),
        |mi AS (
        |  SELECT CAST(sum(CAST(floor(cell.c
        |      * round(ln(CAST(cell.c * nn.n AS DOUBLE)
        |        / CAST(bs.cs * bl.cl2 AS DOUBLE)), 6)
        |      * 1.0e9 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / CAST(nn.n * 1000000000 AS DOUBLE) AS mi
        |  FROM cell JOIN bs ON cell.source = bs.source
        |  JOIN bl ON cell.lang = bl.lang
        |  CROSS JOIN nn
        |  GROUP BY nn.n),
        |hl AS (
        |  SELECT CAST(sum(CAST(floor(cl2
        |      * round(ln(CAST(nn.n AS DOUBLE) / CAST(cl2 AS DOUBLE)), 6)
        |      * 1.0e9 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / CAST(nn.n * 1000000000 AS DOUBLE) AS h_lang
        |  FROM bl CROSS JOIN nn GROUP BY nn.n),
        |hs AS (
        |  SELECT CAST(sum(CAST(floor(cs
        |      * round(ln(CAST(nn.n AS DOUBLE) / CAST(cs AS DOUBLE)), 6)
        |      * 1.0e9 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / CAST(nn.n * 1000000000 AS DOUBLE) AS h_source
        |  FROM bs CROSS JOIN nn GROUP BY nn.n)
        |SELECT mi, h_lang, h_source,
        |  CASE WHEN h_lang = 0.0 THEN NULL ELSE mi / h_lang END
        |    AS u_lang_given_source,
        |  CASE WHEN h_source = 0.0 THEN NULL ELSE mi / h_source END
        |    AS u_source_given_lang
        |FROM mi CROSS JOIN hl CROSS JOIN hs""".stripMargin)
}
