package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Twenty-fifth wave — risk & dependence statistics, the tail-risk row
  * a portfolio dashboard carries next to the Sharpe/beta column
  * (reference renders raw history only, `frontend/src/App.js:464-571`;
  * these are the standard measures computed FROM that history):
  *
  *  - historical VaR + expected shortfall (the α-tail of day-over-day
  *    moves, by exact order statistic — no interpolated percentile);
  *  - Spearman rank correlation between a key's daily close and its
  *    traded quantity (monotone price–volume dependence);
  *  - Kendall tau between the same pair (concordant-pair dependence,
  *    counted exactly via merge-sort inversions);
  *  - rescaled-range (Hurst R/S) statistic of the day-move series
  *    (long-memory screen: trending vs mean-reverting feeds).
  *
  * Exact-parity discipline (house rules): day moves are integer CENT
  * diffs of the tie-safe day-bar closes over PRESENT days (the
  * q_sharpe convention); order statistics are selected by rank windows
  * under a total order (value, day) so ties cannot flip the selection;
  * rank vectors are tie-free permutations (rank by (value, day)); all
  * sums/cross-moments stay integer; every emitted float is ONE
  * division (or division→sqrt) with identical operand order in the
  * DuckDB oracle — except the Hurst exponent proxy, a log ratio of an
  * exactly-agreed double, rounded to 4 dp (the q_token_entropy
  * transcendental discipline).
  *
  * Scale shape: one groupBy shuffle to the |keys|·|days| bar table
  * (calendar-bounded), then per-key windows over bar rows. Kendall's
  * inversion count is O(L log L) per key via a merge-sort fold over
  * the collected rank array (L = |days| is calendar-bounded, so the
  * array is a few-KB constant per key; the oracle's O(L²) pair join is
  * oracle-side only). Nothing touches tick rows after the bar
  * aggregate.
  */
object Breadth25 {

  /** Tail fraction for VaR/ES: k = ceil(n/5) — the 20% tail, sized so
    * the 20–40-day test histories keep a multi-element tail (classic
    * 5% / 1% are constant swaps). */
  private[graft] val TailDen = 5

  /** Day-over-day close diffs in integer cents over present days —
    * the q_sharpe lag convention, with the day kept for tie-safe
    * secondary ordering. */
  private[graft] def dayDiffs(df: DataFrame, keyCol: String, tsCol: String,
                              valCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .select(col(keyCol), col("day"), col("close"))
      .withColumn("__x", col("close") - lag(col("close"), 1).over(w))
      .filter(col("__x").isNotNull)
      .select(col(keyCol), col("day"), col("__x"))
  }

  /** Historical VaR and expected shortfall per key from the day-move
    * tail: rank the diffs ascending under the total order (x, day),
    * keep the k = ceil(n/5) smallest, and emit the k-th smallest (the
    * VaR boundary — the max of the kept set) plus the tail mean (ES =
    * integer tail sum over k, one division). Negated to the loss
    * convention: a -750-cent move is a 7.50 loss. No interpolation
    * anywhere — both engines select the same multiset, so ties at the
    * boundary cannot diverge. */
  private[graft] def varEs(df: DataFrame, keyCol: String, tsCol: String,
                           valCol: String, tieBreak: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    val byX = byKey.orderBy(col("__x").asc, col("day").asc)
    dayDiffs(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__rn", row_number().over(byX).cast("long"))
      .withColumn("__n", count(lit(1)).over(byKey))
      .filter(col("__rn") <= expr(s"(__n + ${TailDen - 1}) div $TailDen"))
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n_days"), count(lit(1)).as("k_tail"),
        max(col("__x")).as("var_cents"), sum(col("__x")).as("__tail_sum"))
      .select(col(keyCol), col("n_days"), col("k_tail"), col("var_cents"),
        (-col("var_cents").cast("double") / lit(100.0)).as("var_loss"),
        (-col("__tail_sum").cast("double") /
          (lit(100.0) * col("k_tail"))).as("es_loss"))
  }

  /** Per-key daily close + traded quantity (the amihud JSON-prop sum),
    * with tie-free rank permutations over (close, day) and (v, day). */
  private[graft] def rankedPairs(df: DataFrame, keyCol: String, tsCol: String,
                                 valCol: String, tieBreak: String,
                                 qtyJsonField: String): DataFrame = {
    val bars = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .select(col(keyCol), col("day"), col("close"))
    val vols = df.withColumn("__day", col(tsCol).cast("date"))
      .withColumn("__q",
        get_json_object(col("props"), s"$$.$qtyJsonField").cast("long"))
      .groupBy(col(keyCol), col("__day").as("day"))
      .agg(sum(col("__q")).as("__v"))
    val byKey = Window.partitionBy(col(keyCol))
    bars.join(vols, Seq(keyCol, "day"))
      .filter(col("__v").isNotNull)
      .withColumn("__rc",
        row_number().over(byKey.orderBy(col("close").asc, col("day").asc))
          .cast("long"))
      .withColumn("__rv",
        row_number().over(byKey.orderBy(col("__v").asc, col("day").asc))
          .cast("long"))
  }

  /** Spearman rho per key between daily close and daily quantity:
    * with tie-free rank permutations, rho = 1 − 6Σd²/(n(n²−1)) — kept
    * as the single integer ratio (n(n²−1) − 6Σd²) / (n(n²−1)), one
    * terminal division. Int64 headroom: Σd² < n³/3 and n(n²−1) ~ n³ —
    * at decade bar counts (n ≈ 3.7k) both sit near 5·10¹⁰, 8 orders
    * inside int64. Keys with n < 2 are emitted unscored. */
  private[graft] def spearman(df: DataFrame, keyCol: String, tsCol: String,
                              valCol: String, tieBreak: String,
                              qtyJsonField: String): DataFrame = {
    val d = col("__rc") - col("__rv")
    val g = rankedPairs(df, keyCol, tsCol, valCol, tieBreak, qtyJsonField)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"), sum(d * d).as("sum_d2"))
    val den = col("n_days") * (col("n_days") * col("n_days") - lit(1L))
    g.select(col(keyCol), col("n_days"), col("sum_d2"),
      when(col("n_days") >= 2,
        (den - lit(6L) * col("sum_d2")).cast("double") / den.cast("double"))
        .as("rho"))
  }

  /** Merge-sort inversion count of a rank sequence — O(L log L), the
    * scale path the O(L²) pair enumeration is not. Shared verbatim by
    * the query UDF and the spec's hand fold. */
  private[graft] def inversions(xs: Seq[Long]): Long = {
    def merge(a: Vector[Long], b: Vector[Long]): (Vector[Long], Long) = {
      val out = Vector.newBuilder[Long]
      var i = 0; var j = 0; var inv = 0L
      while (i < a.length && j < b.length) {
        if (a(i) <= b(j)) { out += a(i); i += 1 }
        else { out += b(j); j += 1; inv += (a.length - i).toLong }
      }
      while (i < a.length) { out += a(i); i += 1 }
      while (j < b.length) { out += b(j); j += 1 }
      (out.result(), inv)
    }
    def go(v: Vector[Long]): (Vector[Long], Long) =
      if (v.length <= 1) (v, 0L)
      else {
        val (l, r) = v.splitAt(v.length / 2)
        val (ls, li) = go(l); val (rs, ri) = go(r)
        val (m, mi) = merge(ls, rs)
        (m, li + ri + mi)
      }
    go(xs.toVector)._2
  }

  /** Kendall tau-a per key between daily close and daily quantity:
    * with tie-free permutations, discordant pairs = inversions of the
    * quantity rank sequence read in close-rank order, and
    * tau = (n(n−1) − 4·inv) / (n(n−1)) — integer numerator and
    * denominator, one terminal division. The rank array is collected
    * per key (calendar-bounded) and folded by the merge-sort counter. */
  private[graft] def kendall(df: DataFrame, keyCol: String, tsCol: String,
                             valCol: String, tieBreak: String,
                             qtyJsonField: String): DataFrame = {
    val invUdf = udf { rv: Seq[Long] => inversions(rv) }
    val g = rankedPairs(df, keyCol, tsCol, valCol, tieBreak, qtyJsonField)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sort_array(collect_list(struct(col("__rc"), col("__rv"))))
          .as("__pairs"))
      .withColumn("n_inversions",
        invUdf(transform(col("__pairs"), _.getField("__rv"))))
    val den = col("n_days") * (col("n_days") - lit(1L))
    g.select(col(keyCol), col("n_days"), col("n_inversions"),
      when(col("n_days") >= 2,
        (den - lit(4L) * col("n_inversions")).cast("double") /
          den.cast("double")).as("tau"))
  }

  /** Rescaled-range (Hurst R/S) statistic per key over day moves x_i:
    * with P_i the prefix sum and T = Σx, the mean-centered partial sum
    * scaled by n is S_i = n·P_i − i·T (integer — the q_cusum trick);
    * R/S = (max S − min S) / √(n·Σx² − (Σx)²) because the 1/n factors
    * cancel against the population σ. One integer range, one integer
    * radicand, one division. The exponent proxy ln(R/S)/ln(n) (the
    * single-window regression point; production fits over window
    * sizes) is a transcendental of exactly-agreed doubles → rounded
    * 4 dp. Int64 headroom: |S_i| ≤ 2n·|T| ~ 10¹⁰ and n·Σx² ~ 10¹⁵ at
    * decade bar counts — re-base cents if a deployment exceeds it. */
  private[graft] def hurstRs(df: DataFrame, keyCol: String, tsCol: String,
                             valCol: String, tieBreak: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    val ord = byKey.orderBy(col("day").asc)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g = dayDiffs(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__p", sum(col("__x")).over(run))
      .withColumn("__i", row_number().over(ord).cast("long"))
      .withColumn("__n", count(lit(1)).over(byKey))
      .withColumn("__t", sum(col("__x")).over(byKey))
      .withColumn("__sxx", sum(col("__x") * col("__x")).over(byKey))
      .withColumn("__s", col("__n") * col("__p") - col("__i") * col("__t"))
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n_days"),
        (max(col("__s")) - min(col("__s"))).as("range_scaled"),
        (max(col("__n")) * max(col("__sxx")) -
          max(col("__t")) * max(col("__t"))).as("__varnum"))
    val rs = col("range_scaled").cast("double") /
      sqrt(col("__varnum").cast("double"))
    g.select(col(keyCol), col("n_days"), col("range_scaled"),
      when(col("__varnum") > 0, rs).as("rs"),
      when(col("__varnum") > 0 && col("range_scaled") > 0 &&
        col("n_days") > 1,
        round(log(rs) / log(col("n_days").cast("double")), 4)).as("hurst"))
  }

  val defs: Map[String, Q] = Map(
    // Historical VaR + expected shortfall from the exact 20% tail.
    "q_var_es" -> ((s, dir) =>
      varEs(Tables.events(s, dir), "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc)),

    // Spearman rank correlation: daily close vs traded quantity.
    "q_spearman" -> ((s, dir) =>
      spearman(Tables.events(s, dir), "user_id", "ts", "value", "event_id",
        "k")
        .orderBy(col("user_id").asc)),

    // Kendall tau via merge-sort inversion count.
    "q_kendall" -> ((s, dir) =>
      kendall(Tables.events(s, dir), "user_id", "ts", "value", "event_id",
        "k")
        .orderBy(col("user_id").asc)),

    // Rescaled-range statistic + single-window Hurst proxy.
    "q_hurst" -> ((s, dir) =>
      hurstRs(Tables.events(s, dir), "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc)))

  /** Shared bar + day-diff CTE prefix (the q_sharpe discipline). */
  private val diffsSql =
    """t AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id, props
      |  FROM events),
      |bars AS (
      |  SELECT user_id, day, max(cl) AS close
      |  FROM (
      |    SELECT user_id, day,
      |      last_value(c) OVER (PARTITION BY user_id, day ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cl
      |    FROM t)
      |  GROUP BY user_id, day),
      |d AS (
      |  SELECT user_id, day,
      |    close - lag(close) OVER (PARTITION BY user_id ORDER BY day) AS x
      |  FROM bars),
      |f AS (SELECT user_id, day, x FROM d WHERE x IS NOT NULL)""".stripMargin

  /** Shared rank-pair CTE prefix (bars + daily quantity + tie-free
    * rank permutations). */
  private val ranksSql =
    s"""$diffsSql,
       |vols AS (
       |  SELECT user_id, day,
       |    CAST(sum(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS v
       |  FROM t GROUP BY user_id, day),
       |j AS (
       |  SELECT b.user_id, b.day, b.close, v.v
       |  FROM bars b JOIN vols v ON b.user_id = v.user_id AND b.day = v.day
       |  WHERE v.v IS NOT NULL),
       |r AS (
       |  SELECT user_id,
       |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY close, day) AS BIGINT) AS rc,
       |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY v, day) AS BIGINT) AS rv
       |  FROM j)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_var_es" ->
      s"""WITH $diffsSql,
         |rk AS (
         |  SELECT user_id, x,
         |    row_number() OVER (PARTITION BY user_id ORDER BY x, day) AS rn,
         |    count(*) OVER (PARTITION BY user_id) AS n
         |  FROM f),
         |tail AS (SELECT * FROM rk WHERE rn <= (n + ${TailDen - 1}) // $TailDen)
         |SELECT user_id, CAST(max(n) AS BIGINT) AS n_days,
         |  CAST(count(*) AS BIGINT) AS k_tail,
         |  CAST(max(x) AS BIGINT) AS var_cents,
         |  -CAST(max(x) AS DOUBLE) / 100.0 AS var_loss,
         |  -CAST(sum(x) AS DOUBLE) / (100.0 * count(*)) AS es_loss
         |FROM tail GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_spearman" ->
      s"""WITH $ranksSql,
         |g AS (
         |  SELECT user_id, count(*) AS n,
         |    CAST(sum((rc - rv) * (rc - rv)) AS BIGINT) AS sd2
         |  FROM r GROUP BY user_id)
         |SELECT user_id, n AS n_days, sd2 AS sum_d2,
         |  CASE WHEN n >= 2
         |    THEN CAST(n * (n * n - 1) - 6 * sd2 AS DOUBLE)
         |      / CAST(n * (n * n - 1) AS DOUBLE) END AS rho
         |FROM g ORDER BY user_id""".stripMargin,

    "q_kendall" ->
      s"""WITH $ranksSql,
         |inv AS (
         |  SELECT a.user_id, CAST(count(*) FILTER (WHERE a.rv > b.rv) AS BIGINT) AS iv
         |  FROM r a JOIN r b ON a.user_id = b.user_id AND a.rc < b.rc
         |  GROUP BY a.user_id),
         |g AS (SELECT user_id, count(*) AS n FROM r GROUP BY user_id)
         |SELECT g.user_id, g.n AS n_days,
         |  COALESCE(i.iv, 0) AS n_inversions,
         |  CASE WHEN g.n >= 2
         |    THEN CAST(g.n * (g.n - 1) - 4 * COALESCE(i.iv, 0) AS DOUBLE)
         |      / CAST(g.n * (g.n - 1) AS DOUBLE) END AS tau
         |FROM g LEFT JOIN inv i ON g.user_id = i.user_id
         |ORDER BY g.user_id""".stripMargin,

    "q_hurst" ->
      s"""WITH $diffsSql,
         |w AS (
         |  SELECT user_id, x,
         |    sum(x) OVER (PARTITION BY user_id ORDER BY day
         |      ROWS UNBOUNDED PRECEDING) AS p,
         |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS BIGINT) AS i,
         |    count(*) OVER (PARTITION BY user_id) AS n,
         |    sum(x) OVER (PARTITION BY user_id) AS t,
         |    sum(x * x) OVER (PARTITION BY user_id) AS sxx
         |  FROM f),
         |s AS (SELECT user_id, n, t, sxx, n * p - i * t AS sdev FROM w),
         |g AS (
         |  SELECT user_id, CAST(max(n) AS BIGINT) AS n,
         |    CAST(max(sdev) - min(sdev) AS BIGINT) AS rng,
         |    CAST(max(n) * max(sxx) - max(t) * max(t) AS BIGINT) AS varnum
         |  FROM s GROUP BY user_id)
         |SELECT user_id, n AS n_days, rng AS range_scaled,
         |  CASE WHEN varnum > 0
         |    THEN CAST(rng AS DOUBLE) / sqrt(CAST(varnum AS DOUBLE)) END AS rs,
         |  CASE WHEN varnum > 0 AND rng > 0 AND n > 1
         |    THEN round(ln(CAST(rng AS DOUBLE) / sqrt(CAST(varnum AS DOUBLE)))
         |      / ln(CAST(n AS DOUBLE)), 4) END AS hurst
         |FROM g ORDER BY user_id""".stripMargin)
}
