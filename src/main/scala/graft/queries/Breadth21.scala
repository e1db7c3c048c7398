package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Twenty-first wave — the remaining WINDOW-expressible channel /
  * oscillator indicators over daily bars, the chart-overlay row a crypto
  * dashboard grows after MACD/RSI (frontend chart conventions; the
  * reference renders raw history only, `frontend/src/App.js:464-571`):
  *
  *  - Donchian channel (N-day prior high/low band + breakout flags —
  *    the turtle-trading channel);
  *  - Williams %R (where the close sits in the trailing range — the
  *    inverted stochastic);
  *  - Vortex indicator (VI+/VI−: ratio of directional range movement
  *    to total true range);
  *  - Money Flow Index (volume-weighted RSI over typical-price flows);
  *  - CCI (deviation of typical price from its own window mean, in
  *    units of the window's mean absolute deviation).
  *
  * Exact-parity discipline (house rules): every input is an integer —
  * cent highs/lows/closes from the tie-safe q_ohlc bar formulation,
  * typical price kept in the ×3 domain (H+L+C, NOT /3 — the 3 cancels
  * in every emitted ratio), quantities integer JSON props — and every
  * indicator ends in ONE terminal float step with identical operand
  * order in the DuckDB oracle. CCI's mean absolute deviation looks
  * float-native (|TP − SMA|) but rescales by n²: with S = ΣTP over the
  * window, CCI = n·(n·TP − S) / (0.015 · Σᵢ|n·TPᵢ − S|) — numerator and
  * deviation sum are INTEGERS, one division at the end.
  *
  * Scale shape (all five): one groupBy shuffle to the |keys|·|days| bar
  * table (calendar-bounded — it cannot outgrow keys × calendar), then
  * ONE window shuffle per key in the integer domain. No joins except
  * MFI's bar↔day-quantity equi-join, co-partitioned on (key, day). The
  * CCI window materializes a w-element list per bar row (w = 5 here):
  * memory is w × bar rows, linear in the bar table with a constant-w
  * factor, spill-safe.
  */
object Breadth21 {

  private[graft] val W = 5

  /** Donchian channel against the `w` bars strictly BEFORE each day
    * (prior-window stance shared with the Bollinger/stochastic screens:
    * a breakout test against a band the current bar itself inflates
    * would suppress exactly the flag it should raise). Emits the band in
    * integer cents, the midline as one division, and breakout flags from
    * integer comparisons. Bars without a full prior window are unscored
    * (dropped, the q_bollinger convention). */
  private[graft] def donchian(df: DataFrame, keyCol: String, tsCol: String,
                              valCol: String, tieBreak: String,
                              w: Int): DataFrame = {
    val days = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val frame = days.rowsBetween(-w, -1)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__n", count(lit(1)).over(frame))
      .withColumn("__hh", max(col("high")).over(frame))
      .withColumn("__ll", min(col("low")).over(frame))
      .filter(col("__n") === w)
      .select(col(keyCol), col("day"), col("close").as("close_cents"),
        col("__hh").as("don_hi_cents"), col("__ll").as("don_lo_cents"),
        ((col("__hh") + col("__ll")).cast("double") / lit(200.0)).as("don_mid"),
        (col("close") > col("__hh")).as("break_up"),
        (col("close") < col("__ll")).as("break_dn"))
  }

  /** Williams %R over the trailing `w` bars INCLUDING the current one
    * (the classic definition — %R measures where THIS close sits in the
    * range it belongs to): −100 · (HH − C) / (HH − LL). Flat windows
    * (HH = LL) are unscored-null; short windows dropped. */
  private[graft] def williamsR(df: DataFrame, keyCol: String, tsCol: String,
                               valCol: String, tieBreak: String,
                               w: Int): DataFrame = {
    val days = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val frame = days.rowsBetween(-(w - 1), 0)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__n", count(lit(1)).over(frame))
      .withColumn("__hh", max(col("high")).over(frame))
      .withColumn("__ll", min(col("low")).over(frame))
      .filter(col("__n") === w)
      .select(col(keyCol), col("day"), col("close").as("close_cents"),
        col("__hh").as("win_hi_cents"), col("__ll").as("win_lo_cents"),
        when(col("__hh") > col("__ll"),
          lit(-100.0) * (col("__hh") - col("close")).cast("double") /
            (col("__hh") - col("__ll")).cast("double")).as("williams_r"))
  }

  /** Vortex indicator over the trailing `w` DIFF bars (bars with a
    * previous bar — upward/downward vortex movement and true range all
    * need yesterday): VI+ = Σ|H − prevL| / ΣTR, VI− = Σ|L − prevH| /
    * ΣTR. Integer cent sums, two terminal divisions; all-flat windows
    * (ΣTR = 0) are unscored-null; short windows dropped. */
  private[graft] def vortex(df: DataFrame, keyCol: String, tsCol: String,
                            valCol: String, tieBreak: String,
                            w: Int): DataFrame = {
    val days = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val diffs = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__ph", lag(col("high"), 1).over(days))
      .withColumn("__pl", lag(col("low"), 1).over(days))
      .withColumn("__pc", lag(col("close"), 1).over(days))
      .filter(col("__pc").isNotNull)
      .withColumn("__tr", greatest(col("high") - col("low"),
        abs(col("high") - col("__pc")), abs(col("low") - col("__pc"))))
      .withColumn("__vmp", abs(col("high") - col("__pl")))
      .withColumn("__vmm", abs(col("low") - col("__ph")))
    // the frame runs over the DIFF rows (first bar per key excluded by
    // construction) — this filter-then-window is intentional, unlike the
    // ATR full-frame caveat: diff rows ARE the indicator's row set
    val frame = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(-(w - 1), 0)
    diffs
      .withColumn("__n", count(lit(1)).over(frame))
      .withColumn("__str", sum(col("__tr")).over(frame))
      .withColumn("__svmp", sum(col("__vmp")).over(frame))
      .withColumn("__svmm", sum(col("__vmm")).over(frame))
      .filter(col("__n") === w)
      .select(col(keyCol), col("day"),
        col("__str").as("sum_tr_cents"),
        col("__svmp").as("sum_vm_plus_cents"),
        col("__svmm").as("sum_vm_minus_cents"),
        when(col("__str") > 0,
          col("__svmp").cast("double") / col("__str").cast("double"))
          .as("vi_plus"),
        when(col("__str") > 0,
          col("__svmm").cast("double") / col("__str").cast("double"))
          .as("vi_minus"))
  }

  /** Money Flow Index over the trailing `w` DIFF bars: typical price in
    * the ×3 integer domain (TP3 = H + L + C; the /3 cancels in the
    * ratio), raw flow = TP3 × day quantity (the JSON `k` prop summed per
    * day, nulls contributing 0 — the OBV discipline), flows signed by
    * the TP3 day-over-day direction (unchanged days contribute to
    * NEITHER side but stay in the window, the classic treatment).
    * MFI = 100 · pos / (pos + neg); zero-flow windows unscored-null.
    * Int64 headroom: TP3 ~ 1.5·10⁵ × day-quantity sums ~ 10⁶ → flow
    * ~ 10¹¹, windowed ×w — room to ~10⁶× before wrap. */
  private[graft] def mfi(df: DataFrame, keyCol: String, tsCol: String,
                         valCol: String, tieBreak: String,
                         qtyJsonField: String, w: Int): DataFrame = {
    val bars = Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
    val qty = df.withColumn("__day", col(tsCol).cast("date"))
      .withColumn("__q", coalesce(
        get_json_object(col("props"), s"$$.$qtyJsonField").cast("long"), lit(0L)))
      .groupBy(col(keyCol), col("__day").as("day"))
      .agg(sum(col("__q")).as("__v"))
    val days = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val flows = bars.join(qty, Seq(keyCol, "day"))
      .withColumn("__tp", col("high") + col("low") + col("close"))
      .withColumn("__d", col("__tp") - lag(col("__tp"), 1).over(days))
      .filter(col("__d").isNotNull)
      .withColumn("__pf", when(col("__d") > 0, col("__tp") * col("__v"))
        .otherwise(lit(0L)))
      .withColumn("__nf", when(col("__d") < 0, col("__tp") * col("__v"))
        .otherwise(lit(0L)))
    val frame = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(-(w - 1), 0)
    flows
      .withColumn("__n", count(lit(1)).over(frame))
      .withColumn("__sp", sum(col("__pf")).over(frame))
      .withColumn("__sn", sum(col("__nf")).over(frame))
      .filter(col("__n") === w)
      .select(col(keyCol), col("day"),
        col("__sp").as("pos_flow"), col("__sn").as("neg_flow"),
        when(col("__sp") + col("__sn") > 0,
          lit(100.0) * col("__sp").cast("double") /
            (col("__sp") + col("__sn")).cast("double")).as("mfi"))
  }

  /** CCI over the trailing `w` bars (current included) on ×3 typical
    * price, INTEGER-RESCALED: the textbook (TP − SMA) / (0.015 · MD)
    * multiplies out to n·(n·TP − S) / (0.015 · Σᵢ|n·TPᵢ − S|) with
    * S = ΣTPᵢ — numerator and deviation sum exact integers, one terminal
    * division. The window's member list rides a collect_list frame and
    * the deviation folds with the `aggregate` higher-order function
    * (order-irrelevant: integer addition) — no self-join, no float
    * accumulation. Zero-deviation (all-equal) windows unscored-null. */
  private[graft] def cci(df: DataFrame, keyCol: String, tsCol: String,
                         valCol: String, tieBreak: String,
                         w: Int): DataFrame = {
    val frame = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(-(w - 1), 0)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__tp", col("high") + col("low") + col("close"))
      .withColumn("__n", count(lit(1)).over(frame))
      .withColumn("__ws", collect_list(col("__tp")).over(frame))
      .filter(col("__n") === w)
      .withColumn("__s", aggregate(col("__ws"), lit(0L), (acc, x) => acc + x))
      .withColumn("__dev", aggregate(col("__ws"), lit(0L),
        (acc, x) => acc + abs(lit(w.toLong) * x - col("__s"))))
      .select(col(keyCol), col("day"), col("__tp").as("tp3_cents"),
        col("__dev").as("dev_sum"),
        when(col("__dev") > 0,
          (lit(w.toLong) * (lit(w.toLong) * col("__tp") - col("__s")))
            .cast("double") / (lit(0.015) * col("__dev").cast("double")))
          .as("cci"))
  }

  val defs: Map[String, Q] = Map(
    // 5-day Donchian channel (prior-window band + breakout flags).
    "q_donchian" -> ((s, dir) =>
      donchian(Tables.events(s, dir), "user_id", "ts", "value", "event_id", W)
        .orderBy(col("user_id").asc, col("day").asc)),

    // Williams %R over the trailing 5-day range.
    "q_williams_r" -> ((s, dir) =>
      williamsR(Tables.events(s, dir), "user_id", "ts", "value", "event_id", W)
        .orderBy(col("user_id").asc, col("day").asc)),

    // Vortex VI+/VI− over 5 diff bars.
    "q_vortex" -> ((s, dir) =>
      vortex(Tables.events(s, dir), "user_id", "ts", "value", "event_id", W)
        .orderBy(col("user_id").asc, col("day").asc)),

    // Money Flow Index over 5 diff bars (×3 typical price, JSON qty).
    "q_mfi" -> ((s, dir) =>
      mfi(Tables.events(s, dir), "user_id", "ts", "value", "event_id", "k", W)
        .orderBy(col("user_id").asc, col("day").asc)),

    // CCI over the trailing 5 bars, integer-rescaled mean deviation.
    "q_cci" -> ((s, dir) =>
      cci(Tables.events(s, dir), "user_id", "ts", "value", "event_id", W)
        .orderBy(col("user_id").asc, col("day").asc)))

  /** Shared oracle prefix: tie-safe daily cent bars with high/low (the
    * Breadth19/20 `barsSql` shape). */
  private val barsSql =
    """t AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id, props
      |  FROM events),
      |bars AS (
      |  SELECT user_id, day, max(cl) AS close, max(c) AS high, min(c) AS low
      |  FROM (
      |    SELECT user_id, day, c,
      |      last_value(c) OVER (PARTITION BY user_id, day ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cl
      |    FROM t)
      |  GROUP BY user_id, day)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_donchian" ->
      s"""WITH $barsSql,
         |wnd AS (
         |  SELECT user_id, day, close,
         |    count(*) OVER f AS n, max(high) OVER f AS hh, min(low) OVER f AS ll
         |  FROM bars
         |  WINDOW f AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN $W PRECEDING AND 1 PRECEDING))
         |SELECT user_id, day, close AS close_cents,
         |  hh AS don_hi_cents, ll AS don_lo_cents,
         |  CAST(hh + ll AS DOUBLE) / 200.0 AS don_mid,
         |  close > hh AS break_up, close < ll AS break_dn
         |FROM wnd WHERE n = $W ORDER BY user_id, day""".stripMargin,

    "q_williams_r" ->
      s"""WITH $barsSql,
         |wnd AS (
         |  SELECT user_id, day, close,
         |    count(*) OVER f AS n, max(high) OVER f AS hh, min(low) OVER f AS ll
         |  FROM bars
         |  WINDOW f AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN ${W - 1} PRECEDING AND CURRENT ROW))
         |SELECT user_id, day, close AS close_cents,
         |  hh AS win_hi_cents, ll AS win_lo_cents,
         |  CASE WHEN hh > ll
         |    THEN -100.0 * CAST(hh - close AS DOUBLE) / CAST(hh - ll AS DOUBLE)
         |  END AS williams_r
         |FROM wnd WHERE n = $W ORDER BY user_id, day""".stripMargin,

    "q_vortex" ->
      s"""WITH $barsSql,
         |diffs AS (
         |  SELECT user_id, day,
         |    greatest(high - low, abs(high - pc), abs(low - pc)) AS tr,
         |    abs(high - pl) AS vmp, abs(low - ph) AS vmm
         |  FROM (
         |    SELECT user_id, day, high, low,
         |      lag(high) OVER w AS ph, lag(low) OVER w AS pl,
         |      lag(close) OVER w AS pc
         |    FROM bars
         |    WINDOW w AS (PARTITION BY user_id ORDER BY day))
         |  WHERE pc IS NOT NULL),
         |wnd AS (
         |  SELECT user_id, day, count(*) OVER f AS n,
         |    CAST(sum(tr) OVER f AS BIGINT) AS str,
         |    CAST(sum(vmp) OVER f AS BIGINT) AS svmp,
         |    CAST(sum(vmm) OVER f AS BIGINT) AS svmm
         |  FROM diffs
         |  WINDOW f AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN ${W - 1} PRECEDING AND CURRENT ROW))
         |SELECT user_id, day, str AS sum_tr_cents,
         |  svmp AS sum_vm_plus_cents, svmm AS sum_vm_minus_cents,
         |  CASE WHEN str > 0 THEN CAST(svmp AS DOUBLE) / CAST(str AS DOUBLE) END AS vi_plus,
         |  CASE WHEN str > 0 THEN CAST(svmm AS DOUBLE) / CAST(str AS DOUBLE) END AS vi_minus
         |FROM wnd WHERE n = $W ORDER BY user_id, day""".stripMargin,

    "q_mfi" ->
      s"""WITH $barsSql,
         |qty AS (
         |  SELECT user_id, day,
         |    CAST(sum(coalesce(CAST(json_extract_string(props, '$$.k') AS BIGINT), 0)) AS BIGINT) AS v
         |  FROM t GROUP BY user_id, day),
         |flows AS (
         |  SELECT user_id, day,
         |    CASE WHEN d > 0 THEN tp * v ELSE 0 END AS pf,
         |    CASE WHEN d < 0 THEN tp * v ELSE 0 END AS nf
         |  FROM (
         |    SELECT b.user_id, b.day, b.high + b.low + b.close AS tp, q.v,
         |      b.high + b.low + b.close
         |        - lag(b.high + b.low + b.close) OVER (PARTITION BY b.user_id ORDER BY b.day) AS d
         |    FROM bars b JOIN qty q ON b.user_id = q.user_id AND b.day = q.day)
         |  WHERE d IS NOT NULL),
         |wnd AS (
         |  SELECT user_id, day, count(*) OVER f AS n,
         |    CAST(sum(pf) OVER f AS BIGINT) AS sp,
         |    CAST(sum(nf) OVER f AS BIGINT) AS sn
         |  FROM flows
         |  WINDOW f AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN ${W - 1} PRECEDING AND CURRENT ROW))
         |SELECT user_id, day, sp AS pos_flow, sn AS neg_flow,
         |  CASE WHEN sp + sn > 0
         |    THEN 100.0 * CAST(sp AS DOUBLE) / CAST(sp + sn AS DOUBLE)
         |  END AS mfi
         |FROM wnd WHERE n = $W ORDER BY user_id, day""".stripMargin,

    "q_cci" ->
      s"""WITH $barsSql,
         |tp AS (SELECT user_id, day, high + low + close AS tp FROM bars),
         |wnd AS (
         |  SELECT user_id, day, tp,
         |    count(*) OVER f AS n, list(tp) OVER f AS ws
         |  FROM tp
         |  WINDOW f AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN ${W - 1} PRECEDING AND CURRENT ROW)),
         |summed AS (
         |  SELECT user_id, day, tp, ws, CAST(list_sum(ws) AS BIGINT) AS s
         |  FROM wnd WHERE n = $W),
         |dev AS (
         |  SELECT user_id, day, tp, s,
         |    CAST(list_sum(list_transform(ws, x -> abs($W * x - s))) AS BIGINT) AS dv
         |  FROM summed)
         |SELECT user_id, day, tp AS tp3_cents, dv AS dev_sum,
         |  CASE WHEN dv > 0
         |    THEN CAST($W * ($W * tp - s) AS DOUBLE) / (0.015 * CAST(dv AS DOUBLE))
         |  END AS cci
         |FROM dev ORDER BY user_id, day""".stripMargin)
}
