package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Eighty-ninth wave — series decomposition, changepoints, 2-D PCA.
  *
  *  - **q_stl_decomp**: an additive trend/seasonal/residual
  *    decomposition of each key's daily close series — trend is the
  *    CENTERED 7-day moving average (full windows only), weekly
  *    seasonal is the weekday mean of the detrended series, residual
  *    is what remains. The float discipline keeps every numerator
  *    integer: detrend×7 = 7·close − Σ7 is an exact int64, so the
  *    weekday seasonal is one division of two integer sums, and
  *    trend/residual are per-row expressions on exact operands.
  *  - **q_changepoint**: single binary-segmentation changepoint per
  *    key — the split t maximizing SSB(t) ∝ (n·S_t − t·S_n)²/(t·(n−t)).
  *    The numerator square is decimal-exact; each candidate's quotient
  *    is ONE IEEE division of two exactly-cast integers, bit-identical
  *    on any engine, ranked with an integer tie-break — no float ever
  *    enters an unordered sum or an inexact accumulation.
  *  - **q_pca2**: closed-form 2×2 PCA per key on (day move, day
  *    volume): covariance entries from exact integer sums, eigenvalues
  *    by the quadratic formula, explained-variance ratio, and the
  *    principal-axis angle (atan2, 6-dp-rounded like every libm emit).
  *
  * Scale shape: all per-key windows on the memoized day grids +
  * |keys|-row aggregates; the changepoint argmax is a window over each
  * key's |days| candidate splits with integer comparisons only. */
object Breadth88 {

  /** Additive 7-day-trend / weekday-seasonal / residual decomposition. */
  private[graft] def stlDecomp(df: DataFrame, keyCol: String, tsCol: String,
                               valCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val w7 = w.rowsBetween(-3, 3)
    val bars = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .select(col(keyCol), col("day"), col("close"))
      .withColumn("__s7", sum(col("close")).over(w7))
      .withColumn("__n7", count(lit(1)).over(w7))
      .filter(col("__n7") === 7)
      .withColumn("__det7", lit(7L) * col("close") - col("__s7"))
      .withColumn("__wd",
        expr("datediff(day, date'1995-01-01') % 7").cast("long"))
    val seas = bars.groupBy(col(keyCol), col("__wd"))
      .agg(sum(col("__det7")).as("__sd"), count(lit(1)).as("__nd"))
      .withColumn("__seas",
        col("__sd").cast("double") / (lit(7.0) * col("__nd").cast("double")))
    bars.join(seas.select(col(keyCol), col("__wd"), col("__seas")),
        Seq(keyCol, "__wd"))
      .select(col(keyCol), col("day"), col("close"),
        (col("__s7").cast("double") / lit(7.0)).as("trend"),
        col("__seas").as("seasonal"),
        (col("__det7").cast("double") / lit(7.0) - col("__seas"))
          .as("residual"))
      .orderBy(col(keyCol).asc, col("day").asc)
  }

  /** Exact-integer binary-segmentation changepoint per key. */
  private[graft] def changepoint(df: DataFrame, keyCol: String, tsCol: String,
                                 valCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val bars = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .select(col(keyCol), col("day"), col("close"))
      .withColumn("__t", row_number().over(w).cast("long"))
      .withColumn("__st", sum(col("close"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .withColumn("__sn", sum(col("close"))
        .over(Window.partitionBy(col(keyCol))))
      .filter(col("__t") < col("__n")) // splits leave both sides nonempty
    // SSB(t) ∝ a²/b with a = n·S_t − t·S_n (decimal-exact), b = t(n−t).
    val cand = bars
      .withColumn("__a", (col("__n") * col("__st") - col("__t") * col("__sn"))
        .cast("decimal(38,0)"))
      .withColumn("__b", (col("__t") * (col("__n") - col("__t")))
        .cast("decimal(38,0)"))
      .withColumn("__a2", col("__a") * col("__a"))
    // Rank on q = a²/b: a² is decimal-exact (a can exceed 2^26, so the
    // square overflows int64 but not decimal38); the ONE cast of each
    // exact integer to double is IEEE round-to-nearest on both engines
    // and the division of two identical doubles is bit-identical — so
    // the ranking, with its integer t tie-break, picks the same split
    // everywhere. No float ever feeds an unordered sum.
    val scored = cand.withColumn("__q",
      col("__a2").cast("double") / col("__b").cast("double"))
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col("__q").desc, col("__t").asc)
    scored.withColumn("__rn", row_number().over(ord))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("day").as("split_day"),
        col("__t").as("n_pre"), (col("__n") - col("__t")).as("n_post"),
        (col("__st").cast("double") / col("__t").cast("double"))
          .as("pre_mean_cents"),
        ((col("__sn") - col("__st")).cast("double") /
          (col("__n") - col("__t")).cast("double")).as("post_mean_cents"))
      .orderBy(col(keyCol).asc)
  }

  /** Closed-form 2×2 PCA per key on (day move, day volume). */
  private[graft] def pca2(df: DataFrame, keyCol: String, tsCol: String,
                          valCol: String, tieBreak: String,
                          qtyJsonField: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val moves = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .select(col(keyCol), col("day"), col("close"))
      .withColumn("__x", col("close") - lag(col("close"), 1).over(w))
      .filter(col("__x").isNotNull)
    val vols = Breadth27.dayVols(df, keyCol, tsCol, qtyJsonField)
    val g = moves.join(vols, Seq(keyCol, "day"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum(col("__x")).as("__sx"), sum(col("__v")).as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__v") * col("__v")).as("__syy"),
        sum(col("__x") * col("__v")).as("__sxy"))
    val nD = col("n_days").cast("double")
    val a = col("__sxx").cast("double") / nD -
      (col("__sx").cast("double") / nD) * (col("__sx").cast("double") / nD)
    val c = col("__syy").cast("double") / nD -
      (col("__sy").cast("double") / nD) * (col("__sy").cast("double") / nD)
    val b = col("__sxy").cast("double") / nD -
      (col("__sx").cast("double") / nD) * (col("__sy").cast("double") / nD)
    val disc = sqrt((a - c) * (a - c) + lit(4.0) * b * b)
    val l1 = (a + c + disc) / lit(2.0)
    val l2 = (a + c - disc) / lit(2.0)
    g.select(col(keyCol), col("n_days"),
      round(a, 6).as("var_x"), round(c, 6).as("var_y"),
      round(b, 6).as("cov_xy"),
      round(l1, 6).as("lambda1"), round(l2, 6).as("lambda2"),
      when(l1 + l2 > 0, round(l1 / (l1 + l2), 6)).as("evr1"),
      when(abs(b) > 0 || a =!= c,
        round(atan2(l1 - a, b), 6)).as("axis_angle"))
      .orderBy(col(keyCol).asc)
  }

  val defs: Map[String, Q] = Map(
    "q_stl_decomp" -> ((s, dir) =>
      stlDecomp(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_changepoint" -> ((s, dir) =>
      changepoint(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_pca2" -> ((s, dir) =>
      pca2(Tables.events(s, dir), "user_id", "ts", "value", "event_id",
        "k")))

  private val barsSql =
    """t AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id
      |  FROM events),
      |bars AS (
      |  SELECT user_id, day, max(cl) AS close
      |  FROM (
      |    SELECT user_id, day,
      |      last_value(c) OVER (PARTITION BY user_id, day
      |        ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |        AS cl
      |    FROM t)
      |  GROUP BY user_id, day)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_stl_decomp" ->
      s"""WITH $barsSql,
         |win AS (
         |  SELECT user_id, day, close,
         |    CAST(sum(close) OVER (PARTITION BY user_id ORDER BY day
         |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS s7,
         |    CAST(count(*) OVER (PARTITION BY user_id ORDER BY day
         |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS n7
         |  FROM bars),
         |full7 AS (
         |  SELECT user_id, day, close, s7,
         |    7 * close - s7 AS det7,
         |    CAST(date_diff('day', DATE '1995-01-01', day) % 7 AS BIGINT)
         |      AS wd
         |  FROM win WHERE n7 = 7),
         |seas AS (
         |  SELECT user_id, wd,
         |    CAST(sum(det7) AS DOUBLE)
         |      / (7.0 * CAST(count(*) AS DOUBLE)) AS seasonal
         |  FROM full7 GROUP BY 1, 2)
         |SELECT f.user_id, f.day, f.close,
         |  CAST(s7 AS DOUBLE) / 7.0 AS trend,
         |  s.seasonal AS seasonal,
         |  CAST(det7 AS DOUBLE) / 7.0 - s.seasonal AS residual
         |FROM full7 f JOIN seas s ON f.user_id = s.user_id AND f.wd = s.wd
         |ORDER BY f.user_id, f.day""".stripMargin,

    "q_changepoint" ->
      s"""WITH $barsSql,
         |pre AS (
         |  SELECT user_id, day,
         |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
         |      AS BIGINT) AS t,
         |    CAST(sum(close) OVER (PARTITION BY user_id ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS st,
         |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
         |    CAST(sum(close) OVER (PARTITION BY user_id) AS BIGINT) AS sn
         |  FROM bars),
         |cand AS (
         |  SELECT user_id, day, t, st, n, sn,
         |    CAST(n * st - t * sn AS HUGEINT) AS a,
         |    CAST(t * (n - t) AS HUGEINT) AS b
         |  FROM pre WHERE t < n),
         |scored AS (
         |  SELECT *, CAST(a * a AS DOUBLE) / CAST(b AS DOUBLE) AS q
         |  FROM cand),
         |best AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id
         |      ORDER BY q DESC, t) AS rn
         |  FROM scored)
         |SELECT user_id, day AS split_day, t AS n_pre,
         |  n - t AS n_post,
         |  CAST(st AS DOUBLE) / CAST(t AS DOUBLE) AS pre_mean_cents,
         |  CAST(sn - st AS DOUBLE) / CAST(n - t AS DOUBLE)
         |    AS post_mean_cents
         |FROM best WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_pca2" ->
      s"""WITH $barsSql,
         |mv AS (
         |  SELECT user_id, day, x FROM (
         |    SELECT user_id, day,
         |      close - lag(close) OVER (PARTITION BY user_id ORDER BY day)
         |        AS x
         |    FROM bars)
         |  WHERE x IS NOT NULL),
         |vols AS (
         |  SELECT user_id, day,
         |    CAST(sum(CAST(json_extract_string(props, '$$.k') AS BIGINT))
         |      AS BIGINT) AS v
         |  FROM (SELECT user_id, CAST(ts AS DATE) AS day, props
         |        FROM events)
         |  GROUP BY 1, 2),
         |g AS (
         |  SELECT mv.user_id, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(v) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(v * v) AS BIGINT) AS syy,
         |    CAST(sum(x * v) AS BIGINT) AS sxy
         |  FROM mv JOIN vols ON mv.user_id = vols.user_id
         |    AND mv.day = vols.day
         |  GROUP BY 1),
         |m AS (
         |  SELECT user_id, n,
         |    CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
         |      - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
         |        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS a,
         |    CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
         |      - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
         |        * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS c,
         |    CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
         |      - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
         |        * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS b
         |  FROM g),
         |e AS (
         |  SELECT user_id, n, a, c, b,
         |    sqrt((a - c) * (a - c) + 4.0 * b * b) AS disc
         |  FROM m)
         |SELECT user_id, n AS n_days,
         |  round(a, 6) AS var_x, round(c, 6) AS var_y,
         |  round(b, 6) AS cov_xy,
         |  round((a + c + disc) / 2.0, 6) AS lambda1,
         |  round((a + c - disc) / 2.0, 6) AS lambda2,
         |  CASE WHEN (a + c + disc) / 2.0 + (a + c - disc) / 2.0 > 0
         |    THEN round(((a + c + disc) / 2.0)
         |      / ((a + c + disc) / 2.0 + (a + c - disc) / 2.0), 6)
         |  END AS evr1,
         |  CASE WHEN abs(b) > 0 OR NOT a = c
         |    THEN round(atan2((a + c + disc) / 2.0 - a, b), 6)
         |  END AS axis_angle
         |FROM e ORDER BY user_id""".stripMargin)
}
