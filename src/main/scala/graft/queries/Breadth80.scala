package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Eighty-first wave — signal evaluation, price-volume coupling,
  * fulfilment spans.
  *
  *  - **q_signal_ic**: the pooled rank information coefficient of the
  *    1-day momentum signal — within each day's cross-section, keys
  *    are ranked by their PREVIOUS move (the signal) and by their
  *    current move (the outcome), and one Pearson runs over ALL
  *    (rank, rank) pairs pooled across days. Pooling keeps the
  *    measure a single integer-sum aggregate (a mean of per-day ICs
  *    would be an order-dependent float sum — the banned trap);
  *    ranks are fully (value, key) tie-broken.
  *  - **q_volume_move_corr**: does volume move prices? Per key, the
  *    Pearson correlation of |day move| against day traded volume
  *    (the q_amihud JSON `k` quantity, summed per day). Five integer
  *    sums; the aggregate-level companion of Amihud's ratio.
  *  - **q_order_fill_span**: fulfilment span per order (max − min
  *    line shipdate) rolled up per order priority — lines-per-order,
  *    mean and max span days. Exercises the orders×lineitem join at
  *    the order grain with integer day arithmetic.
  *
  * Scale shape: signal_ic is one |key·days| grid + two day-partition
  * rank windows + ONE global integer aggregate; volume_move_corr
  * rides the memoized bar/vol grids; order_fill_span aggregates
  * lineitem to |orders| rows before the broadcast-friendly priority
  * rollup. */
object Breadth80 {

  /** Pooled rank IC of prev-day move vs current move. */
  private[graft] def signalIc(df: DataFrame, keyCol: String, tsCol: String,
                              valCol: String, tieBreak: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val m = Breadth67.dayMoves(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__sig", lag(col("__x"), 1).over(byKey))
      .filter(col("__sig").isNotNull)
    val rs = Window.partitionBy(col("day"))
      .orderBy(col("__sig").asc, col(keyCol).asc)
    val rf = Window.partitionBy(col("day"))
      .orderBy(col("__x").asc, col(keyCol).asc)
    val ranked = m
      .withColumn("__rs", row_number().over(rs).cast("long"))
      .withColumn("__rf", row_number().over(rf).cast("long"))
    val g = ranked.agg(count(lit(1)).as("n_pairs"),
      sum(col("__rs")).as("__sx"), sum(col("__rf")).as("__sy"),
      sum(col("__rs") * col("__rf")).as("__sxy"),
      sum(col("__rs") * col("__rs")).as("__sxx"),
      sum(col("__rf") * col("__rf")).as("__syy"))
    val num = col("n_pairs") * col("__sxy") - col("__sx") * col("__sy")
    val vx = col("n_pairs") * col("__sxx") - col("__sx") * col("__sx")
    val vy = col("n_pairs") * col("__syy") - col("__sy") * col("__sy")
    g.select(col("n_pairs"),
      when(vx > 0 && vy > 0,
        num.cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
        .as("pooled_ic"))
  }

  /** Pearson of |day move| vs day volume per key. */
  private[graft] def volumeMoveCorr(df: DataFrame, keyCol: String,
                                    tsCol: String, valCol: String,
                                    tieBreak: String,
                                    qtyJsonField: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val moves = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .select(col(keyCol), col("day"), col("close"))
      .withColumn("__x",
        abs(col("close") - lag(col("close"), 1).over(w)))
      .filter(col("__x").isNotNull)
    val vols = Breadth27.dayVols(df, keyCol, tsCol, qtyJsonField)
    val g = moves.join(vols, Seq(keyCol, "day"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum(col("__x")).as("__sx"), sum(col("__v")).as("__sy"),
        sum(col("__x") * col("__v")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__v") * col("__v")).as("__syy"))
    val num = col("n_days") * col("__sxy") - col("__sx") * col("__sy")
    val vx = col("n_days") * col("__sxx") - col("__sx") * col("__sx")
    val vy = col("n_days") * col("__syy") - col("__sy") * col("__sy")
    g.select(col(keyCol), col("n_days"),
      when(vx > 0 && vy > 0,
        num.cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
        .as("vol_move_corr"))
      .orderBy(col(keyCol).asc)
  }

  /** Fulfilment span per order, rolled up per priority. */
  private[graft] def orderFillSpan(orders: DataFrame,
                                   lineitem: DataFrame): DataFrame = {
    val spans = lineitem
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("__nl"),
        datediff(max(col("l_shipdate").cast("date")),
          min(col("l_shipdate").cast("date"))).cast("long").as("__span"))
    orders.select(col("o_orderkey"), col("o_orderpriority"))
      .join(spans, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("__nl")).as("n_lines"),
        sum(col("__span")).as("__ss"),
        max(col("__span")).as("max_span_days"))
      .select(col("o_orderpriority"), col("n_orders"), col("n_lines"),
        (col("__ss").cast("double") / col("n_orders").cast("double"))
          .as("mean_span_days"),
        col("max_span_days"))
      .orderBy(col("o_orderpriority").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_signal_ic" -> ((s, dir) =>
      signalIc(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id")),
    "q_volume_move_corr" -> ((s, dir) =>
      volumeMoveCorr(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id", "k")),
    "q_order_fill_span" -> ((s, dir) =>
      orderFillSpan(Tables.orders(s, dir), Tables.lineitem(s, dir))))

  val oracle: Map[String, String] = Map(
    "q_signal_ic" ->
      s"""WITH ${Breadth67.movesSql},
         |sg AS (
         |  SELECT user_id, day, x,
         |    lag(x) OVER (PARTITION BY user_id ORDER BY day) AS sig
         |  FROM mv),
         |rk AS (
         |  SELECT
         |    CAST(row_number() OVER (PARTITION BY day
         |      ORDER BY sig, user_id) AS BIGINT) AS rs,
         |    CAST(row_number() OVER (PARTITION BY day
         |      ORDER BY x, user_id) AS BIGINT) AS rf
         |  FROM sg WHERE sig IS NOT NULL),
         |g AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(rs) AS BIGINT) AS sx, CAST(sum(rf) AS BIGINT) AS sy,
         |    CAST(sum(rs * rf) AS BIGINT) AS sxy,
         |    CAST(sum(rs * rs) AS BIGINT) AS sxx,
         |    CAST(sum(rf * rf) AS BIGINT) AS syy
         |  FROM rk)
         |SELECT n AS n_pairs,
         |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
         |    THEN CAST(n * sxy - sx * sy AS DOUBLE)
         |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
         |        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
         |  END AS pooled_ic
         |FROM g""".stripMargin,

    "q_volume_move_corr" ->
      s"""WITH ${Breadth67.movesSql},
         |vols AS (
         |  SELECT user_id, day,
         |    CAST(sum(CAST(json_extract_string(props, '$$.k') AS BIGINT))
         |      AS BIGINT) AS v
         |  FROM (SELECT user_id, CAST(ts AS DATE) AS day, props
         |        FROM events)
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT mv.user_id, abs(mv.x) AS x, vols.v
         |  FROM mv JOIN vols ON mv.user_id = vols.user_id
         |    AND mv.day = vols.day),
         |g AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(v) AS BIGINT) AS sy,
         |    CAST(sum(x * v) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(v * v) AS BIGINT) AS syy
         |  FROM j GROUP BY 1)
         |SELECT user_id, n AS n_days,
         |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
         |    THEN CAST(n * sxy - sx * sy AS DOUBLE)
         |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
         |        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
         |  END AS vol_move_corr
         |FROM g ORDER BY user_id""".stripMargin,

    "q_order_fill_span" ->
      """WITH spans AS (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS nl,
        |    CAST(date_diff('day', min(CAST(l_shipdate AS DATE)),
        |      max(CAST(l_shipdate AS DATE))) AS BIGINT) AS span
        |  FROM lineitem GROUP BY 1)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(nl) AS BIGINT) AS n_lines,
        |  CAST(CAST(sum(span) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS mean_span_days,
        |  CAST(max(span) AS BIGINT) AS max_span_days
        |FROM orders JOIN spans ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
