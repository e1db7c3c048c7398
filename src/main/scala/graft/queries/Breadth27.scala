package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Twenty-seventh wave — the volume-flow indicators: the four classic
  * price×volume measures a crypto dashboard's indicator menu carries
  * that the engine lacked (the reference renders raw history only,
  * `frontend/src/App.js:464-571`; volume rides the JSON `k` prop as in
  * q_amihud):
  *
  *  - Chaikin money flow (CMF): windowed ratio of money-flow volume to
  *    volume;
  *  - accumulation/distribution line (ADL) + Chaikin oscillator
  *    (EMA3 − EMA10 of the ADL — a running sum feeding a recurrence);
  *  - Elder's force index (day move × volume, EMA13-smoothed);
  *  - detrended price oscillator (DPO): close lagged half a window
  *    minus the window SMA — pure integers until one division.
  *
  * Exact-parity discipline (house rules): the fractional money-flow
  * multiplier is quantized PER BAR to integer 1e-6 units by ONE
  * identical-operand float expression — floor(1e6·(2C−H−L)·v/(H−L)) —
  * then integer-summed (order-free; doji bars H=L contribute 0, the
  * standard stance); CMF is one terminal division of two integer
  * sums; the ADL is an integer running sum of those quanta; the
  * Chaikin oscillator and force-index EMAs are day-ordered recurrence
  * folds (the Breadth19 O(L) loop-UDF discipline) whose every step is
  * the same IEEE expression as the recursive-CTE oracle; DPO stays
  * integer via w·DPO = w·C_lag − ΣC with one terminal /(w·100).
  *
  * Int64 headroom: the money-flow quantum is bounded by 10⁶·|2C−H−L|·v
  * ≤ 10⁶·range·v — at exchange scale (daily volume ~10⁹ units) the
  * 1e-6 quantizer overflows; re-base volume to coarser units (or the
  * quantizer to 1e-3) there, exactly like the marketBeta re-basing
  * note. The testdata's per-day volumes (≤10³) leave ~9 orders.
  *
  * Scale shape: one groupBy to the |keys|·|days| bar table, one
  * (key, day) vol aggregate joined on the bar grid, then per-key
  * windows (CMF/DPO) or one executor-local O(L) fold per key
  * (ADL-osc, force index — the EMA-family shape). Streaming twins for
  * both recurrences ride the transformWithState scaffolding over a
  * volume-carrying bar stream (graft.streaming.Streams
  * .streamingForceIndex / streamingChaikinOsc).
  */
object Breadth27 {

  private[graft] val CmfW = 5
  private[graft] val DpoW = 8
  private[graft] val DpoShift = DpoW / 2 + 1
  private[graft] val A3 = 2.0 / 4.0
  private[graft] val A10 = 2.0 / 11.0
  private[graft] val A13 = 2.0 / 14.0

  /** Per-(key, day) traded volume: the summed JSON `k` prop (the
    * q_amihud convention); days with no parseable quantity drop. Shared
    * across the ~15 volume-indicator queries via the plan-keyed memo
    * (Breadth13.memoizedOnPlan) — the JSON extraction + aggregate runs
    * once per (session, input plan), not once per query. */
  private[graft] def dayVols(df: DataFrame, keyCol: String, tsCol: String,
                             qtyJsonField: String): DataFrame =
    Breadth13.memoizedOnPlan(df, s"vols|$keyCol|$tsCol|$qtyJsonField") {
      dayVolsPlan(df, keyCol, tsCol, qtyJsonField)
    }

  /** The raw (un-memoized) day-volume plan — see Breadth13
    * .dayBarsCentsPlan (the bench chain-resample twin). */
  private[graft] def dayVolsPlan(df: DataFrame, keyCol: String, tsCol: String,
                                 qtyJsonField: String): DataFrame =
    df.withColumn("__day", col(tsCol).cast("date"))
      .withColumn("__q",
        get_json_object(col("props"), s"$$.$qtyJsonField").cast("long"))
      .groupBy(col(keyCol), col("__day").as("day"))
      .agg(sum(col("__q")).as("__v"))
      .filter(col("__v").isNotNull)

  /** The per-bar money-flow quantum as a plain function — shared
    * verbatim by the streaming twin; the Column expression in
    * [[volBars]] computes the identical IEEE steps (spec-pinned). */
  private[graft] def mfvQuantum(h: Long, l: Long, c: Long, v: Long): Long =
    if (h != l)
      math.floor(1.0e6 * ((2L * c - h - l) * v).toDouble / (h - l).toDouble)
        .toLong
    else 0L

  /** OHLC bars joined with day volume and the per-bar money-flow
    * quantum mfv_q = floor(1e6·(2C−H−L)·v/(H−L)) (0 on doji bars). */
  private[graft] def volBars(df: DataFrame, keyCol: String, tsCol: String,
                             valCol: String, tieBreak: String,
                             qtyJsonField: String): DataFrame =
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .join(dayVols(df, keyCol, tsCol, qtyJsonField), Seq(keyCol, "day"))
      .withColumn("__mfvq",
        when(col("high") =!= col("low"),
          floor(lit(1.0e6) *
            ((lit(2L) * col("close") - col("high") - col("low")) * col("__v"))
              .cast("double") /
            (col("high") - col("low")).cast("double")).cast("long"))
          .otherwise(lit(0L)))

  /** Chaikin money flow over the trailing `CmfW` bars: Σ mfv_q over
    * 1e6·Σ v — two integer window sums, one division. Short windows
    * and zero-volume windows are unscored. */
  private[graft] def cmf(df: DataFrame, keyCol: String, tsCol: String,
                         valCol: String, tieBreak: String,
                         qtyJsonField: String): DataFrame = {
    val f = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(-(CmfW - 1), 0)
    volBars(df, keyCol, tsCol, valCol, tieBreak, qtyJsonField)
      .withColumn("__n", count(lit(1)).over(f))
      .withColumn("__sm", sum(col("__mfvq")).over(f))
      .withColumn("__sv", sum(col("__v")).over(f))
      .filter(col("__n") === CmfW)
      .select(col(keyCol), col("day"), col("close").as("close_cents"),
        col("__sm").as("sum_mfv_q"), col("__sv").as("sum_vol"),
        when(col("__sv") > 0,
          col("__sm").cast("double") / (lit(1.0e6) * col("__sv")))
          .as("cmf"))
  }

  /** Detrended price oscillator: C_{t−(w/2+1)} − SMA_w, kept integer as
    * w·C_lag − ΣC with one terminal /(w·100) into the price domain.
    * Scored only where both the lag and the full window exist. */
  private[graft] def dpo(df: DataFrame, keyCol: String, tsCol: String,
                         valCol: String, tieBreak: String): DataFrame = {
    val ord = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val f = ord.rowsBetween(-(DpoW - 1), 0)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .withColumn("__n", count(lit(1)).over(f))
      .withColumn("__sc", sum(col("close")).over(f))
      .withColumn("__lagc", lag(col("close"), DpoShift).over(ord))
      .filter(col("__n") === DpoW && col("__lagc").isNotNull)
      .select(col(keyCol), col("day"), col("close").as("close_cents"),
        (lit(DpoW.toLong) * col("__lagc") - col("__sc")).as("dpo_num"),
        ((lit(DpoW.toLong) * col("__lagc") - col("__sc")).cast("double") /
          lit(DpoW * 100.0)).as("dpo"))
  }

  /** Force-index accumulator: previous close + the EMA13 value — the
    * streaming twin's O(1) ValueState. */
  private[graft] case class FiAcc(prevClose: Long, fi: Option[Long],
                                  ema: Option[Double])

  /** One force-index step — shared verbatim by batch and stream. The
    * first bar only seeds the previous close; from the second bar,
    * fi = (C_t − C_{t−1})·v_t (integer cents·qty) and the EMA13 seeds
    * at the first fi. */
  private[graft] def fiStep(st: Option[FiAcc], c: Long, v: Long): FiAcc =
    st match {
      case None => FiAcc(c, None, None)
      case Some(a) =>
        val fi = (c - a.prevClose) * v
        val e = a.ema match {
          case None => fi.toDouble
          case Some(prev) => A13 * fi + (1.0 - A13) * prev
        }
        FiAcc(c, Some(fi), Some(e))
    }

  /** ADL/Chaikin accumulator: the running integer ADL quantum plus the
    * two EMAs — the streaming twin's O(1) ValueState. */
  private[graft] case class AdlAcc(adlQ: Long, e3: Double, e10: Double)

  /** One ADL/Chaikin-oscillator step — shared verbatim by batch and
    * stream. adl_q accumulates the bar's money-flow quantum; both EMAs
    * seed at the first ADL value and read the NEW adl each step. */
  private[graft] def adlStep(st: Option[AdlAcc], mfvQ: Long): AdlAcc =
    st match {
      case None => AdlAcc(mfvQ, mfvQ.toDouble, mfvQ.toDouble)
      case Some(a) =>
        val adl = a.adlQ + mfvQ
        AdlAcc(adl, A3 * adl + (1.0 - A3) * a.e3,
          A10 * adl + (1.0 - A10) * a.e10)
    }

  /** Force index per key: raw (C−C_prev)·v plus its EMA13, via the
    * collected-bar O(L) fold (one UDF call per key). */
  private[graft] def forceIndex(df: DataFrame, keyCol: String, tsCol: String,
                                valCol: String, tieBreak: String,
                                qtyJsonField: String): DataFrame = {
    val byKey = volBars(df, keyCol, tsCol, valCol, tieBreak, qtyJsonField)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("day"), col("close"),
        col("__v")))).as("__bars"))
    val loop = udf { (cs: Seq[Long], vs: Seq[Long]) =>
      var st: Option[FiAcc] = None
      cs.indices.map { k =>
        val a = fiStep(st, cs(k), vs(k))
        st = Some(a)
        (a.fi, a.ema)
      }
    }
    byKey.withColumn("__s", loop(
        transform(col("__bars"), _.getField("close")),
        transform(col("__bars"), _.getField("__v"))))
      .select(col(keyCol), explode(zip_with(col("__bars"), col("__s"),
        (b, s) => struct(b.getField("day").as("day"),
          b.getField("close").as("close_cents"),
          s.getField("_1").as("fi_raw"),
          s.getField("_2").as("fi_ema13")))).as("r"))
      .filter(col("r.fi_raw").isNotNull)
      .select(col(keyCol), col("r.day"), col("r.close_cents"),
        col("r.fi_raw"), col("r.fi_ema13"))
  }

  /** ADL + Chaikin oscillator per key: the integer ADL running sum and
    * EMA3−EMA10 over it, via the collected-bar O(L) fold. */
  private[graft] def adlChaikin(df: DataFrame, keyCol: String, tsCol: String,
                                valCol: String, tieBreak: String,
                                qtyJsonField: String): DataFrame = {
    val byKey = volBars(df, keyCol, tsCol, valCol, tieBreak, qtyJsonField)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("day"), col("__mfvq"))))
        .as("__bars"))
    val loop = udf { (ms: Seq[Long]) =>
      var st: Option[AdlAcc] = None
      ms.map { m =>
        val a = adlStep(st, m)
        st = Some(a)
        (a.adlQ, a.e3 - a.e10)
      }
    }
    byKey.withColumn("__s", loop(transform(col("__bars"),
        _.getField("__mfvq"))))
      .select(col(keyCol), explode(zip_with(col("__bars"), col("__s"),
        (b, s) => struct(b.getField("day").as("day"),
          s.getField("_1").as("adl_q"),
          s.getField("_2").as("osc_q")))).as("r"))
      .select(col(keyCol), col("r.day"), col("r.adl_q"),
        (col("r.adl_q").cast("double") / lit(1.0e6)).as("adl"),
        (col("r.osc_q") / lit(1.0e6)).as("chaikin_osc"))
  }

  val defs: Map[String, Q] = Map(
    // Chaikin money flow: quantized money-flow volume over volume.
    "q_cmf" -> ((s, dir) =>
      cmf(Tables.events(s, dir), "user_id", "ts", "value", "event_id", "k")
        .orderBy(col("user_id").asc, col("day").asc)),

    // Detrended price oscillator: lagged close minus the window SMA.
    "q_dpo" -> ((s, dir) =>
      dpo(Tables.events(s, dir), "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc, col("day").asc)),

    // Elder force index: day move x volume, EMA13-smoothed.
    "q_force_index" -> ((s, dir) =>
      forceIndex(Tables.events(s, dir), "user_id", "ts", "value", "event_id",
        "k")
        .orderBy(col("user_id").asc, col("day").asc)),

    // Accumulation/distribution line + Chaikin oscillator.
    "q_adl_chaikin" -> ((s, dir) =>
      adlChaikin(Tables.events(s, dir), "user_id", "ts", "value", "event_id",
        "k")
        .orderBy(col("user_id").asc, col("day").asc)))

  /** Shared OHLC bar + volume + money-flow-quantum CTE prefix. */
  private val volBarsSql =
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
      |  GROUP BY user_id, day),
      |vols AS (
      |  SELECT user_id, day,
      |    CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS v
      |  FROM t GROUP BY user_id, day),
      |vb AS (
      |  SELECT b.user_id, b.day, b.close, b.high, b.low, v.v,
      |    CASE WHEN b.high <> b.low
      |      THEN CAST(floor(1.0e6
      |        * CAST((2 * b.close - b.high - b.low) * v.v AS DOUBLE)
      |        / CAST(b.high - b.low AS DOUBLE)) AS BIGINT)
      |      ELSE 0 END AS mfvq
      |  FROM bars b JOIN vols v ON b.user_id = v.user_id AND b.day = v.day
      |  WHERE v.v IS NOT NULL)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_cmf" ->
      s"""WITH $volBarsSql,
         |w AS (
         |  SELECT user_id, day, close,
         |    count(*) OVER f AS n,
         |    CAST(sum(mfvq) OVER f AS BIGINT) AS sm,
         |    CAST(sum(v) OVER f AS BIGINT) AS sv
         |  FROM vb
         |  WINDOW f AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN ${CmfW - 1} PRECEDING AND CURRENT ROW))
         |SELECT user_id, day, close AS close_cents, sm AS sum_mfv_q,
         |  sv AS sum_vol,
         |  CASE WHEN sv > 0
         |    THEN CAST(sm AS DOUBLE) / (1.0e6 * sv) END AS cmf
         |FROM w WHERE n = $CmfW ORDER BY user_id, day""".stripMargin,

    "q_dpo" ->
      s"""WITH t AS (
         |  SELECT user_id, CAST(ts AS DATE) AS day,
         |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id
         |  FROM events),
         |bars AS (
         |  SELECT user_id, day, max(cl) AS close
         |  FROM (
         |    SELECT user_id, day,
         |      last_value(c) OVER (PARTITION BY user_id, day ORDER BY ts, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cl
         |    FROM t)
         |  GROUP BY user_id, day),
         |w AS (
         |  SELECT user_id, day, close,
         |    count(*) OVER f AS n,
         |    CAST(sum(close) OVER f AS BIGINT) AS sc,
         |    lag(close, $DpoShift) OVER
         |      (PARTITION BY user_id ORDER BY day) AS lagc
         |  FROM bars
         |  WINDOW f AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN ${DpoW - 1} PRECEDING AND CURRENT ROW))
         |SELECT user_id, day, close AS close_cents,
         |  $DpoW * lagc - sc AS dpo_num,
         |  CAST($DpoW * lagc - sc AS DOUBLE) / ${DpoW * 100}.0 AS dpo
         |FROM w WHERE n = $DpoW AND lagc IS NOT NULL
         |ORDER BY user_id, day""".stripMargin,

    "q_force_index" ->
      s"""WITH RECURSIVE $volBarsSql,
         |nb AS (
         |  SELECT user_id, day, close, v,
         |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS BIGINT) AS i
         |  FROM vb),
         |r AS (
         |  SELECT user_id, day, close, i,
         |    CAST(NULL AS BIGINT) AS fi, CAST(NULL AS DOUBLE) AS e
         |  FROM nb WHERE i = 1
         |  UNION ALL
         |  SELECT b.user_id, b.day, b.close, b.i,
         |    (b.close - r.close) * b.v,
         |    CASE WHEN r.e IS NULL
         |      THEN CAST((b.close - r.close) * b.v AS DOUBLE)
         |      ELSE (2.0/14.0) * CAST((b.close - r.close) * b.v AS DOUBLE)
         |        + (1.0 - 2.0/14.0) * r.e
         |    END
         |  FROM r JOIN nb b ON b.user_id = r.user_id AND b.i = r.i + 1)
         |SELECT user_id, day, close AS close_cents, fi AS fi_raw,
         |  e AS fi_ema13
         |FROM r WHERE fi IS NOT NULL ORDER BY user_id, day""".stripMargin,

    "q_adl_chaikin" ->
      s"""WITH RECURSIVE $volBarsSql,
         |nb AS (
         |  SELECT user_id, day, mfvq,
         |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS BIGINT) AS i
         |  FROM vb),
         |r AS (
         |  SELECT user_id, day, i, mfvq AS adl,
         |    CAST(mfvq AS DOUBLE) AS e3, CAST(mfvq AS DOUBLE) AS e10
         |  FROM nb WHERE i = 1
         |  UNION ALL
         |  SELECT b.user_id, b.day, b.i, r.adl + b.mfvq,
         |    (2.0/4.0) * CAST(r.adl + b.mfvq AS DOUBLE) + (1.0 - 2.0/4.0) * r.e3,
         |    (2.0/11.0) * CAST(r.adl + b.mfvq AS DOUBLE) + (1.0 - 2.0/11.0) * r.e10
         |  FROM r JOIN nb b ON b.user_id = r.user_id AND b.i = r.i + 1)
         |SELECT user_id, day, adl AS adl_q,
         |  CAST(adl AS DOUBLE) / 1.0e6 AS adl,
         |  (e3 - e10) / 1.0e6 AS chaikin_osc
         |FROM r ORDER BY user_id, day""".stripMargin)
}
