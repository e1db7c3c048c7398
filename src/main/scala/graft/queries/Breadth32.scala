package graft.queries

import graft.Tables
import graft.ops.Latest
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirty-second wave — the as-of join's tolerance parameter, two
  * range-normalized oscillators, and a corpus-filtering decision op:
  *
  *  - tolerance-bounded as-of join (pandas merge_asof's `tolerance`:
  *    the latest fact within [probe − tol, probe]) in BOTH forms —
  *    union+window and the native AsofJoinExec merge (the tolerance
  *    rides the exec's emit check; the buffered candidate stays, since
  *    a later probe may re-enter tolerance via a newer fact);
  *  - choppiness index (Dreiss: 100·log₁₀(ΣTR/range)/log₁₀(n) over a
  *    14-bar window — integer TR sums and integer range, one scalar
  *    log chain);
  *  - Fisher transform (Ehlers: a 10-bar range normalization feeding a
  *    double recurrence with the 0.999 clamp — the combinator's ring
  *    state again);
  *  - perplexity gate (keep/drop flags at the corpus 90th percentile
  *    of the q_unigram_lm perplexity — the filtering DECISION the
  *    scoring rung feeds).
  *
  * Exact-parity discipline: tolerance comparisons are timestamp
  * integer comparisons; choppiness sums are integer cents; Fisher's
  * step is a fixed IEEE chain (constants as divisions in SQL) folded
  * in day order with the recursive-CTE oracle's operand order; the
  * gate ranks on the ALREADY-PINNED rounded perplexity with doc_id
  * tie-breaks, so the flag is integer logic over pinned floats.
  *
  * Scale shape: the as-of forms keep their one-shuffle-per-side merge
  * (tolerance is a per-probe O(1) emit check); the oscillators ride
  * the memoized bar grid; the gate ranks the |corpus|-sized DOC-LEVEL
  * table (the q_ks_drift altitude — at 10⁹ docs you'd range-partition
  * the sort; the token-level work stays distributed either way).
  */
object Breadth32 {

  /** 4 h in micros — the q_asof_tol operating point (picked to split
    * the sf0.001 probes into a real matched/nulled mix). */
  private[graft] val AsofTolMicros = 4L * 3600L * 1000000L
  private[graft] val ChopN = 14
  private[graft] val FisherW = 10
  private[graft] val FisherA = 33.0 / 100.0
  private[graft] val FisherB = 67.0 / 100.0
  private[graft] val FisherClamp = 999.0 / 1000.0
  private[graft] val PplKeep = 9.0 / 10.0

  private def weeklyProbes(s: org.apache.spark.sql.SparkSession,
                           e: DataFrame): DataFrame = {
    val probeTs = Seq("2024-01-07", "2024-01-14", "2024-01-21", "2024-01-28")
    e.select(col("user_id")).distinct()
      .crossJoin(s.range(1).select(
        explode(array(probeTs.map(d => to_timestamp_ntz(lit(d))): _*))
          .as("probe_ts")))
  }

  /** Choppiness index per key: 100·log₁₀(ΣTR₁₄ / (max₁₄H − min₁₄L)) /
    * log₁₀(14) — trending markets score low, sideways markets high.
    * True ranges are the q_atr integers (intraday spread vs gap
    * through prior close); bars without a prior close drop; full
    * windows with a positive range only. */
  private[graft] def choppiness(df: DataFrame, keyCol: String, tsCol: String,
                                valCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val f = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(-(ChopN - 1), 0)
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .select(col(keyCol), col("day"), col("close"), col("high"), col("low"))
      .withColumn("__pc", lag(col("close"), 1).over(w))
      .filter(col("__pc").isNotNull)
      .withColumn("__tr", greatest(col("high") - col("low"),
        abs(col("high") - col("__pc")), abs(col("low") - col("__pc"))))
      .withColumn("__n", count(lit(1)).over(f))
      .withColumn("__str", sum(col("__tr")).over(f))
      .withColumn("__rng",
        max(col("high")).over(f) - min(col("low")).over(f))
      .filter(col("__n") === ChopN)
      .select(col(keyCol), col("day"), col("close").as("close_cents"),
        // the sum/range RATIO is the exact-pinned value (one integer
        // division); the log form rounds to 6 dp because libm log10
        // differs by an ulp between engines on ~1% of inputs (the
        // q_parkinson stance: ~1e-8/row boundary-coincidence tail)
        when(col("__rng") > 0,
          col("__str").cast("double") / col("__rng").cast("double"))
          .as("tr_over_range"),
        when(col("__rng") > 0 && col("__str") > 0,
          round(lit(100.0) * log10(col("__str").cast("double")
            / col("__rng").cast("double")) / log10(lit(ChopN.toDouble)), 6))
          .as("chop"))
  }

  /** Fisher accumulator: the trailing ≤w (high, low) ring plus the two
    * recurrence values (None until the first full window). */
  private[graft] case class FisherAcc(hs: Seq[Long], ls: Seq[Long],
                                      v: Double, fish: Double,
                                      live: Boolean)

  /** One Fisher step — shared batch/oracle operand order. Until w bars
    * exist the state is warm-up (emit None); from the first full
    * window: raw = (C − minL)/(maxH − minL) (0.5 on a flat window),
    * v = 0.33·2·(raw − 0.5) + 0.67·v_prev clamped to ±0.999,
    * fish = 0.5·ln((1+v)/(1−v)) + 0.5·fish_prev. */
  private[graft] def fisherStep(st: Option[FisherAcc], c: Long, h: Long,
                                l: Long): FisherAcc = {
    val prev = st.getOrElse(FisherAcc(Nil, Nil, 0.0, 0.0, live = false))
    val hs = (prev.hs :+ h).takeRight(FisherW)
    val ls = (prev.ls :+ l).takeRight(FisherW)
    if (hs.length < FisherW) FisherAcc(hs, ls, 0.0, 0.0, live = false)
    else {
      val mxh = hs.max
      val mnl = ls.min
      val raw =
        if (mxh > mnl) (c - mnl).toDouble / (mxh - mnl).toDouble else 0.5
      val v0 = FisherA * 2.0 * (raw - 0.5) + FisherB * prev.v
      val v = if (v0 > FisherClamp) FisherClamp
              else if (v0 < -FisherClamp) -FisherClamp else v0
      val fish = 0.5 * math.log((1.0 + v) / (1.0 - v)) + 0.5 * prev.fish
      FisherAcc(hs, ls, v, fish, live = true)
    }
  }

  /** Fisher transform per key over the daily bars — one Recurrence
    * fold (O(w) ring state); warm-up bars drop. */
  private[graft] def fisher(df: DataFrame, keyCol: String, tsCol: String,
                            valCol: String, tieBreak: String): DataFrame =
    graft.ops.Recurrence.series(df, keyCol, tsCol, valCol, tieBreak) {
      (st: Option[FisherAcc], b: graft.ops.Bar) =>
        val a = fisherStep(st, b.close, b.high, b.low)
        (a, if (a.live) Some((a.v, a.fish)) else None)
    } { (b, s) =>
      // the EMITTED fisher rounds to 6 dp: libm ln differs by an ulp
      // between engines on ~0.05% of inputs (sf0.1-measured), and the
      // 0.5 recurrence factor damps internal drift to ~2 ulp, so the
      // rounding absorbs it (the q_parkinson stance); fisher_v is
      // exact arithmetic and stays unrounded
      struct(b.getField("day").as("day"),
        b.getField("close").as("close_cents"),
        s.getField("_1").as("fisher_v"),
        round(s.getField("_2"), 6).as("fisher"))
    }
      .filter(col("fisher_v").isNotNull)

  /** Perplexity gate over the documents corpus: rank docs by the
    * q_unigram_lm perplexity (ascending, doc_id tie-break) and keep
    * the lowest 90% — the filtering decision downstream mixture
    * sampling consumes. The ranked input is the |corpus|-sized
    * doc-level score table. */
  private[graft] def pplGate(s: org.apache.spark.sql.SparkSession,
                             dir: String): DataFrame = {
    val scored = Extensions8.defs("q_unigram_lm")(s, dir)
      .select(col("doc_id"), col("ppl"))
    val n = scored.agg(count(lit(1)).as("__n"))
    val w = Window.orderBy(col("ppl").asc, col("doc_id").asc)
    scored.withColumn("__rank", row_number().over(w))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("ppl"), col("__rank").as("ppl_rank"),
        col("__n").as("n_docs"),
        (col("__rank") <= ceil(lit(PplKeep) * col("__n"))).as("keep"))
  }

  val defs: Map[String, Q] = Map(
    // Tolerance as-of, union+window form: latest fact within 4 h.
    "q_asof_tol" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      Latest.asOfJoinTol(e, weeklyProbes(s, e), "user_id", "ts", "probe_ts",
          "value", "event_id", AsofTolMicros)
        .orderBy(col("user_id").asc, col("probe_ts").asc)
    }),

    // The same through the native merge's emit check — same oracle, so
    // the driver pins the exec's tolerance path to the window form.
    "q_asof_tol_native" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      Latest.asOfJoinNativeValues(e, weeklyProbes(s, e), "user_id", "ts",
          "probe_ts", Seq("value"), "event_id", Some(AsofTolMicros))
        .orderBy(col("user_id").asc, col("probe_ts").asc)
    }),

    // Dreiss choppiness index over 14-bar true-range windows.
    "q_choppiness" -> ((s, dir) =>
      choppiness(Tables.events(s, dir), "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc, col("day").asc)),

    // Ehlers Fisher transform (10-bar range normalization recurrence).
    "q_fisher" -> ((s, dir) =>
      fisher(Tables.events(s, dir), "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id").asc, col("day").asc)),

    // Perplexity keep/drop gate at the corpus 90th percentile.
    "q_ppl_gate" -> ((s, dir) =>
      pplGate(s, dir).orderBy(col("doc_id").asc)))

  /** Shared probe CTE + tolerance-bounded correlated as-of lookup. */
  private val asofTolSql =
    """WITH probes AS (
      |  SELECT user_id, probe_ts
      |  FROM (SELECT DISTINCT user_id FROM events)
      |  CROSS JOIN (VALUES (TIMESTAMP '2024-01-07'), (TIMESTAMP '2024-01-14'),
      |    (TIMESTAMP '2024-01-21'), (TIMESTAMP '2024-01-28')) p(probe_ts))
      |SELECT u.user_id, u.probe_ts,
      |  (SELECT e.value FROM events e
      |   WHERE e.user_id = u.user_id AND e.ts <= u.probe_ts
      |     AND e.ts >= u.probe_ts - INTERVAL 4 HOUR
      |   ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS asof_value
      |FROM probes u ORDER BY user_id, probe_ts""".stripMargin

  /** OHLC day bars + per-key bar index (the q_elder_ray oracle shape). */
  private val ohlcBarsSql =
    """t AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id
      |  FROM events),
      |bars AS (
      |  SELECT user_id, day, max(cl) AS close, max(c) AS high, min(c) AS low
      |  FROM (
      |    SELECT user_id, day, c,
      |      last_value(c) OVER (PARTITION BY user_id, day ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cl
      |    FROM t)
      |  GROUP BY user_id, day),
      |nb AS (
      |  SELECT user_id, day, close, high, low,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS BIGINT) AS i
      |  FROM bars)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_asof_tol" -> asofTolSql,
    "q_asof_tol_native" -> asofTolSql,

    "q_choppiness" ->
      s"""WITH $ohlcBarsSql,
         |d AS (
         |  SELECT user_id, day, close, high, low,
         |    lag(close) OVER (PARTITION BY user_id ORDER BY day) AS pc
         |  FROM nb),
         |tr AS (
         |  SELECT user_id, day, close, high, low,
         |    greatest(high - low, abs(high - pc), abs(low - pc)) AS t
         |  FROM d WHERE pc IS NOT NULL),
         |f AS (
         |  SELECT user_id, day, close,
         |    count(*) OVER w AS n,
         |    CAST(sum(t) OVER w AS BIGINT) AS str,
         |    max(high) OVER w - min(low) OVER w AS rng
         |  FROM tr
         |  WINDOW w AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN ${ChopN - 1} PRECEDING AND CURRENT ROW))
         |SELECT user_id, day, close AS close_cents,
         |  CASE WHEN rng > 0
         |    THEN CAST(str AS DOUBLE) / CAST(rng AS DOUBLE) END AS tr_over_range,
         |  CASE WHEN rng > 0 AND str > 0
         |    THEN round(100.0 * log10(CAST(str AS DOUBLE) / CAST(rng AS DOUBLE))
         |      / log10(${ChopN.toDouble}), 6) END AS chop
         |FROM f WHERE n = $ChopN ORDER BY user_id, day""".stripMargin,

    "q_fisher" ->
      s"""WITH RECURSIVE $ohlcBarsSql,
         |wn AS (
         |  SELECT user_id, day, close, i,
         |    count(*) OVER w AS wcnt,
         |    max(high) OVER w AS mxh, min(low) OVER w AS mnl
         |  FROM nb
         |  WINDOW w AS (PARTITION BY user_id ORDER BY i
         |    ROWS BETWEEN ${FisherW - 1} PRECEDING AND CURRENT ROW)),
         |r AS (
         |  SELECT user_id, day, close, i, mxh, mnl,
         |    CASE
         |      WHEN (CASE WHEN mxh > mnl
         |          THEN (33.0/100.0) * 2.0
         |            * (CAST(close - mnl AS DOUBLE) / CAST(mxh - mnl AS DOUBLE) - 0.5)
         |          ELSE (33.0/100.0) * 2.0 * (0.5 - 0.5) END)
         |        > 999.0/1000.0 THEN 999.0/1000.0
         |      WHEN (CASE WHEN mxh > mnl
         |          THEN (33.0/100.0) * 2.0
         |            * (CAST(close - mnl AS DOUBLE) / CAST(mxh - mnl AS DOUBLE) - 0.5)
         |          ELSE (33.0/100.0) * 2.0 * (0.5 - 0.5) END)
         |        < -(999.0/1000.0) THEN -(999.0/1000.0)
         |      ELSE (CASE WHEN mxh > mnl
         |          THEN (33.0/100.0) * 2.0
         |            * (CAST(close - mnl AS DOUBLE) / CAST(mxh - mnl AS DOUBLE) - 0.5)
         |          ELSE (33.0/100.0) * 2.0 * (0.5 - 0.5) END)
         |    END AS v,
         |    CAST(0.0 AS DOUBLE) AS pfish
         |  FROM wn WHERE i = $FisherW
         |  UNION ALL
         |  SELECT user_id, day, close, i, mxh, mnl,
         |    CASE
         |      WHEN v0 > 999.0/1000.0 THEN 999.0/1000.0
         |      WHEN v0 < -(999.0/1000.0) THEN -(999.0/1000.0)
         |      ELSE v0
         |    END,
         |    0.5 * ln((1.0 + v) / (1.0 - v)) + 0.5 * pfish
         |  FROM (
         |    SELECT b.*, r.v, r.pfish,
         |      (CASE WHEN b.mxh > b.mnl
         |          THEN (33.0/100.0) * 2.0
         |            * (CAST(b.close - b.mnl AS DOUBLE)
         |               / CAST(b.mxh - b.mnl AS DOUBLE) - 0.5)
         |          ELSE (33.0/100.0) * 2.0 * (0.5 - 0.5) END)
         |        + (67.0/100.0) * r.v AS v0
         |    FROM r JOIN wn b ON b.user_id = r.user_id AND b.i = r.i + 1) x
         |    (user_id, day, close, i, wcnt, mxh, mnl, v, pfish, v0))
         |SELECT user_id, day, close AS close_cents, v AS fisher_v,
         |  round(0.5 * ln((1.0 + v) / (1.0 - v)) + 0.5 * pfish, 6) AS fisher
         |FROM r ORDER BY user_id, day""".stripMargin,

    // The scoring CTEs restate the q_unigram_lm oracle VERBATIM (same
    // lp expression, same avg + round discipline) so the gate cannot
    // drift from the scoring rung it filters.
    "q_ppl_gate" ->
      s"""WITH tc AS (
         |  SELECT tok, count(*) AS c FROM (
         |    SELECT unnest(${Extensions.sqlTokens("text")}) AS tok FROM documents)
         |  GROUP BY tok),
         |s AS (SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS v_size FROM tc),
         |dt AS (
         |  SELECT doc_id, unnest(${Extensions.sqlTokens("text")}) AS tok
         |  FROM documents),
         |lp AS (
         |  SELECT d.doc_id,
         |    log2((tc.c + 1)::DOUBLE) - log2((s.n_total + s.v_size)::DOUBLE) AS lp
         |  FROM dt d JOIN tc USING (tok) CROSS JOIN s),
         |ag AS (SELECT doc_id, avg(lp) AS alp FROM lp GROUP BY doc_id),
         |scored AS (
         |  SELECT doc_id, round(power(2.0, -alp), 4) AS ppl FROM ag),
         |ranked AS (
         |  SELECT doc_id, ppl,
         |    CAST(row_number() OVER (ORDER BY ppl, doc_id) AS BIGINT)
         |      AS ppl_rank,
         |    CAST((SELECT count(*) FROM scored) AS BIGINT) AS n_docs
         |  FROM scored)
         |SELECT doc_id, ppl, ppl_rank, n_docs,
         |  ppl_rank <= ceil((9.0/10.0) * n_docs) AS keep
         |FROM ranked ORDER BY doc_id""".stripMargin)
}
