package graft

import graft.ops.{History, Latest, TopK}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's user-facing API surface as a library facade — the
  * three calls a user of the reference's endpoints switches to, over any
  * events-shaped frame:
  *
  *  - `GET /api/prices` (`api/server.js:67-77`): latest row per key,
  *    value-descending → `snapshot`;
  *  - `GET /api/history` (`api/server.js:90-143`): per-key time range
  *    with the four optional-predicate WHERE shapes and inclusive end
  *    day → `history`;
  *  - the dashboard's top-7 + "Other" doughnut feed
  *    (`frontend/src/App.js:87-142`) → `topWithOther`.
  *
  * `session` builds the canonically configured SparkSession (UTC, AQE,
  * ns-parquet handling, graft SQL extensions) so the facade works
  * against the same engine configuration the test/bench harnesses pin.
  */
object Graft {

  /** `getOrCreate` ignores builder configs when a session already
    * exists, so the runtime-settable canon (UTC, nanos handling, AQE,
    * shuffle width) is re-asserted on the returned session either way.
    * `spark.sql.extensions` is create-time-only: an inherited session
    * keeps graft SQL functions/rules only if it was built with them —
    * the one contract `session()` cannot retrofit (documented, not
    * silent: the facade's Column API works regardless). */
  def session(master: String = "local[*]",
              shufflePartitions: Int = 32): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s
  }

  /** Latest row per key (max-ts ties all emitted, the reference's join
    * form), ordered value-descending. */
  def snapshot(events: DataFrame, keyCol: String = "user_id",
               tsCol: String = "ts"): DataFrame =
    Latest.latestPerKeyJoin(events, keyCol, tsCol)
      .orderBy(col("value").desc_nulls_last, col(keyCol).asc)

  /** Per-key history; either bound may be absent (the four WHERE shapes
    * of the reference's dynamic query compiler). */
  def history(events: DataFrame, keyValue: Any,
              startDay: Option[String], endDay: Option[String],
              keyCol: String = "user_id", tsCol: String = "ts",
              tieBreak: String = "event_id"): DataFrame =
    History.keyHistoryOptional(events, keyCol, keyValue, tsCol,
      startDay, endDay, tieBreak)

  /** Top-k buckets + "Other" rollup with percent-of-total. */
  def topWithOther(df: DataFrame, bucketCol: String, valueCol: String,
                   k: Int = 7): DataFrame =
    TopK.withPercentOfTotal(TopK.topKPlusOther(df, bucketCol, valueCol, k),
      valueCol)

  // ---- corpus curation (the training-data extension surface) ----------

  /** Verified near-dup pairs over a document frame: MinHash signatures →
    * LSH band candidates → exact-Jaccard threshold. The one-call batch
    * dedup entry point; defaults match the oracle-checked q_dedup_minhash. */
  def nearDupPairs(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text",
                   threshold: Double = 0.8): DataFrame =
    graft.dedup.Dedup.minhashNearDups(docs, idCol, textCol,
      shingleLen = 3, numHashes = 12, bands = 4, threshold = threshold)

  /** Keep-one-per-cluster dedup decision: every document row — ALL its
    * columns — annotated with its duplicate-cluster id and whether it is
    * the cluster's canonical keeper (the min id), so
    * `.filter(col("keep"))` IS the deduplicated corpus. Feed `pairs`
    * from `nearDupPairs` (or any (id_a, id_b) frame). */
  def dedupKeepList(docs: DataFrame, pairs: DataFrame,
                    idCol: String = "doc_id"): DataFrame =
    docs.join(
      graft.dedup.Dedup.clusterIds(docs.select(col(idCol)), pairs, idCol),
      idCol)
      .withColumn("keep", col("cluster_id") === col(idCol))

  /** Streaming near-dup screen: live documents (needs an event-time `ts`
    * column) checked against the batch corpus index — see
    * graft.streaming.Streams.streamingMinhashNearDups. */
  def liveNearDupScreen(live: DataFrame, corpus: DataFrame, delay: String,
                        idCol: String = "doc_id", textCol: String = "text",
                        threshold: Double = 0.8): DataFrame =
    graft.streaming.Streams.streamingMinhashNearDups(live, corpus,
      idCol, textCol, delay, threshold = threshold)

  // ---- warehouse time-series / maintenance (round-4 surface) ----------

  /** Per-key consecutive-day activity streaks (gaps and islands):
    * n_streaks, max_streak, n_active_days per key. One hash exchange
    * end to end — see ops.Streaks. */
  def activityStreaks(events: DataFrame, keyCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame =
    ops.Streaks.streakSummary(events, keyCol, tsCol)

  /** 2D Pareto frontier, both dimensions minimized; computed on the
    * per-x aggregate, never an all-pairs dominance join — see
    * ops.Skyline. */
  def skyline(df: DataFrame, xCol: String, yCol: String,
              bestCol: String = "best_y", nCol: String = "n_rows"): DataFrame =
    ops.Skyline.frontier2d(df, xCol, yCol, bestCol, nCol)

  /** "What changed since the snapshot": full-outer diff of two keyed
    * state generations (e.g. two committed `batch_id=N` dirs of a
    * snapshot store). Each side is a |keys|-sized scan; `changed` uses
    * null-safe equality so insert- and delete-shaped differences are
    * flagged too — see ops.Merge.generationDiff (shared with the
    * oracle-checked q_time_travel). */
  def snapshotDiff(oldGen: DataFrame, newGen: DataFrame,
                   keyCol: String, valueCol: String): DataFrame =
    ops.Merge.generationDiff(oldGen, newGen, keyCol, valueCol,
      oldName = "value_old", newName = "value_new")

  /** Markov transition matrix over each key's state sequence: counts and
    * per-source probabilities for (prev, curr) state pairs. One lag
    * window on the key partition + one |states|²-sized aggregate — see
    * queries.Breadth9.transitions (oracle-checked as q_transitions). */
  def transitionMatrix(df: DataFrame, keyCol: String, stateCol: String,
                       ordCols: Seq[org.apache.spark.sql.Column]): DataFrame =
    queries.Breadth9.transitions(df, keyCol, stateCol, ordCols)

  /** Trailing-window z-score anomaly screen: each row scored against the
    * 6 rows strictly before it on its key's timeline (bounded ROWS
    * frame — O(frame) per-key state, the form that lifts to a stream).
    * Oracle-checked as q_rolling_zscore. */
  def anomalyScreen(df: DataFrame, keyCol: String, valCol: String,
                    ordCols: Seq[org.apache.spark.sql.Column]): DataFrame =
    queries.Breadth9.rollingZscore(df, keyCol, valCol, ordCols)

  /** Greedy cumulative bin-packing of ordered per-bucket row counts into
    * target-row compaction bins — table maintenance planned from
    * |buckets|-sized metadata. Oracle-checked as q_compaction_plan. */
  def compactionPlan(perBucket: DataFrame, bucketCol: String, nCol: String,
                     targetRows: Long): DataFrame =
    queries.Breadth9.compactionPlan(perBucket, bucketCol, nCol, targetRows)

  /** Streaming twin of [[anomalyScreen]]: the trailing z-score fold on
    * `transformWithState`, per-key state = the ≤6-deep value buffer in
    * the (RocksDB) state store. Spec-pinned equal to the batch form on
    * in-order delivery — see streaming.Streams.streamingZscore. */
  def liveAnomalyScreen(events: org.apache.spark.sql.Dataset[streaming.EventRow])
      : org.apache.spark.sql.Dataset[streaming.ZScored] =
    streaming.Streams.streamingZscore(events)

  /** Fixed-iteration PageRank over an undirected pair list
    * (id_a, id_b) → (node, pr): which member of each near-dup cluster
    * is its authority — a principled keeper choice next to
    * dedupKeepList's min-id rule. Oracle-checked as q_pagerank. */
  def clusterAuthority(pairs: DataFrame, iters: Int = 3): DataFrame =
    queries.Extensions8.pagerank(pairs, iters)

  // ---- price-series analytics (wave 10) -------------------------------

  /** Maximum drawdown per series key: worst peak-to-trough loss over the
    * totally-ordered tick series (running prefix max — O(1) state per
    * key). Oracle-checked as q_drawdown. */
  def maxDrawdown(df: DataFrame, keyCol: String, valCol: String,
                  ordCols: Seq[org.apache.spark.sql.Column]): DataFrame =
    queries.Breadth10.drawdownRows(df, keyCol, valCol, ordCols)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_ticks"),
        max(col(valCol)).as("peak"),
        round(max(col("__dd")), 4).as("max_drawdown"))

  /** Wilder-simplified RSI over the trailing `period` deltas per key —
    * bounded ROWS frame, O(period) state. Oracle-checked as q_rsi. */
  def rsi(df: DataFrame, keyCol: String, valCol: String,
          ordCols: Seq[org.apache.spark.sql.Column], period: Int = 14): DataFrame =
    queries.Breadth10.rsi(df, keyCol, valCol, ordCols, period)

  /** Fast/slow SMA pair + golden-cross flags per row. Oracle-checked as
    * q_sma_cross. */
  def smaCross(df: DataFrame, keyCol: String, valCol: String,
               ordCols: Seq[org.apache.spark.sql.Column],
               fast: Int = 3, slow: Int = 7): DataFrame =
    queries.Breadth10.withCross(
      queries.Breadth10.smaSignal(df, keyCol, valCol, ordCols, fast, slow),
      keyCol, ordCols)

  /** Day-over-day gaps (prior close vs next open) per key from tick
    * data. Oracle-checked as q_gap_days. */
  def dayGaps(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    queries.Breadth10.dayGaps(df, keyCol, valCol)

  // ---- statistical screens (wave 10) ----------------------------------

  /** Benford first-digit screen over a positive monetary column —
    * fabricated-feed detection. Oracle-checked as q_benford. */
  def benfordScreen(df: DataFrame, valCol: String): DataFrame =
    queries.Extensions9.benford(df, valCol)

  /** Lag-1 autocorrelation per series key (momentum / mean-reversion /
    * shuffled-feed tripwire). Oracle-checked as q_autocorr. */
  def lag1Autocorr(df: DataFrame, keyCol: String, valCol: String,
                   ordCols: Seq[org.apache.spark.sql.Column]): DataFrame =
    queries.Extensions9.lag1Autocorr(df, keyCol, valCol, ordCols)

  /** Exponential time-decay trending scores per group ("hot now" beats
    * "big last month"). Oracle-checked as q_decay_trend. */
  def trendingScores(df: DataFrame, grpCol: String, valCol: String,
                     dayCol: String, halfLifeDays: Double = 7.0): DataFrame =
    queries.Extensions9.decayScores(df, grpCol, valCol, dayCol, halfLifeDays)

  /** Flesch-style readability bands over (doc_id, text) — a corpus
    * quality dimension orthogonal to stopword/punct scoring.
    * Oracle-checked as q_readability. */
  def readability(docs: DataFrame): DataFrame =
    queries.Extensions9.readability(docs)

  /** Streaming twin of [[maxDrawdown]]: running peak + worst drawdown as
    * O(1) keyed state on `transformWithState`, one refreshed per-key row
    * per micro-batch. Spec-pinned equal to the batch aggregate on
    * in-order delivery — see streaming.Streams.streamingDrawdown. */
  def liveDrawdown(events: org.apache.spark.sql.Dataset[streaming.EventRow])
      : org.apache.spark.sql.Dataset[streaming.DrawdownSnap] =
    streaming.Streams.streamingDrawdown(events)

  // ---- distribution screens & selection (wave 11) ---------------------

  /** CUSUM change-point screen per series key: range of the
    * mean-centered prefix-sum walk over cent-quantized values — a level
    * shift mid-series scores far above stationary noise. Integer domain
    * end to end. Oracle-checked as q_cusum. */
  def changePointScreen(df: DataFrame, keyCol: String, valCol: String,
                        ordCols: Seq[org.apache.spark.sql.Column]): DataFrame =
    queries.Breadth11.cusumRange(df, keyCol, valCol, ordCols)

  /** One-row Gini concentration of integer volume across keys (0 =
    * uniform, →1 = winner-take-all). Oracle-checked as q_gini. */
  def volumeGini(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    queries.Breadth11.giniConcentration(df, keyCol, valCol)

  /** Two-sample Kolmogorov–Smirnov drift statistic between the rows
    * where `groupFlag` is 0 and 1 — the distribution-level A/B tripwire.
    * Oracle-checked as q_ks_drift. */
  def ksDrift(df: DataFrame, valCol: String,
              groupFlag: org.apache.spark.sql.Column): DataFrame =
    queries.Breadth11.ksDrift(df, valCol, groupFlag)

  /** Exactly-k-per-stratum deterministic sample (md5-ranked, no RNG) —
    * the reproducible eval-set builder. Oracle-checked as q_hash_sample. */
  def evalSample(df: DataFrame, strataCol: String, idCol: String,
                 k: Int): DataFrame =
    queries.Extensions10.hashSample(df, strataCol, idCol, k)

  /** Rank-winsorized per-group statistics: clamp to the k-th
    * smallest/largest before aggregating — robust to a few giant or
    * empty rows. Oracle-checked as q_winsorize. */
  def winsorizedStats(df: DataFrame, grpCol: String, valCol: String,
                      idCol: String, k: Int = 2): DataFrame =
    queries.Extensions10.winsorizedStats(df, grpCol, valCol, idCol, k)

  /** Per-source accounting of what dedup keep-one removed (doc and char
    * counts) from a (doc_id, cluster_id) assignment. Oracle-checked as
    * q_dup_survivorship. */
  def dedupSavings(clusters: DataFrame, docs: DataFrame): DataFrame =
    queries.Extensions10.dedupSavings(clusters, docs)

  // ---- as-of lookup ---------------------------------------------------

  /** As-of lookup, union+window form: for each (key, probe_ts) the
    * latest fact at or before the probe time (null when none; equal-ts
    * ties resolve to the greatest tieBreak). One co-partitioned sort
    * shuffle, no per-probe scan. Oracle-checked as q_asof. */
  def asOfLookup(facts: DataFrame, probes: DataFrame, key: String,
                 tsCol: String, probeTsCol: String, valueCol: String,
                 tieBreak: String): DataFrame =
    ops.Latest.asOfJoin(facts, probes, key, tsCol, probeTsCol, valueCol, tieBreak)

  /** As-of lookup on the native whole-plan operator (AsofJoinExec:
    * co-partitioned single-pass merge, one buffered fact row) — same
    * contract as [[asOfLookup]]; every `valueCols` entry returns as
    * `asof_<name>`, all from the same matched fact. Prefer when probes
    * carry many columns or several fact columns are needed.
    * Oracle-checked as q_asof_native. */
  def asOfLookupNative(facts: DataFrame, probes: DataFrame, key: String,
                       tsCol: String, probeTsCol: String,
                       valueCols: Seq[String], tieBreak: String): DataFrame =
    ops.Latest.asOfJoinNativeValues(facts, probes, key, tsCol, probeTsCol,
      valueCols, tieBreak)

  /** Tolerance-bounded as-of (pandas merge_asof `tolerance`): the
    * latest fact within [probe − tol, probe]; older matches null out.
    * Union+window form; tolerance in micros for timestamp columns
    * (column units for integer time columns). Oracle-checked as
    * q_asof_tol. */
  def asOfLookupTol(facts: DataFrame, probes: DataFrame, key: String,
                    tsCol: String, probeTsCol: String, valueCol: String,
                    tieBreak: String, tolMicros: Long): DataFrame =
    ops.Latest.asOfJoinTol(facts, probes, key, tsCol, probeTsCol, valueCol,
      tieBreak, tolMicros)

  /** [[asOfLookupTol]] on the native merge — the tolerance is an O(1)
    * emit check inside AsofJoinExec (the candidate stays buffered, so a
    * later probe can re-enter tolerance via a newer fact).
    * Oracle-checked as q_asof_tol_native. */
  def asOfLookupTolNative(facts: DataFrame, probes: DataFrame, key: String,
                          tsCol: String, probeTsCol: String,
                          valueCols: Seq[String], tieBreak: String,
                          tolMicros: Long): DataFrame =
    ops.Latest.asOfJoinNativeValues(facts, probes, key, tsCol, probeTsCol,
      valueCols, tieBreak, Some(tolMicros))

  // ---- market microstructure (wave 12) --------------------------------

  /** Daily time-weighted average price per series key — dwell-weighted
    * cents, robust to burst-then-silence tick spacing. Oracle-checked as
    * q_twap. */
  def twap(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
           tieBreak: String): DataFrame =
    queries.Breadth12.twap(df, keyCol, tsCol, valCol, tieBreak)

  /** Realized volatility per series key (root mean squared cent move, in
    * price units). Oracle-checked as q_realized_vol. */
  def realizedVol(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String): DataFrame =
    queries.Breadth12.realizedVol(df, keyCol, tsCol, valCol, tieBreak)

  /** Per-key feed-health row: tick count, largest single-tick move,
    * longest silent gap — the stuck-feed / fat-finger tripwire.
    * Oracle-checked as q_tick_health. */
  def tickHealth(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, tieBreak: String): DataFrame =
    queries.Breadth12.tickHealth(df, keyCol, tsCol, valCol, tieBreak)

  /** Streaming twin of [[realizedVol]]: the exact integer sum of squared
    * cent moves as O(1) keyed state; division + IEEE sqrt at emit only,
    * so stream and batch compute the identical double. Spec-pinned —
    * see streaming.Streams.streamingRealizedVol. */
  def liveRealizedVol(events: org.apache.spark.sql.Dataset[streaming.EventRow])
      : org.apache.spark.sql.Dataset[streaming.RealizedVolSnap] =
    streaming.Streams.streamingRealizedVol(events)

  /** Streaming twin of [[tickHealth]]: largest move + longest silence as
    * O(1) keyed state on `transformWithState`, one refreshed per-key row
    * per micro-batch. Spec-pinned equal to the batch window form on
    * in-order delivery — see streaming.Streams.streamingTickHealth. */
  def liveTickHealth(events: org.apache.spark.sql.Dataset[streaming.EventRow])
      : org.apache.spark.sql.Dataset[streaming.TickHealthSnap] =
    streaming.Streams.streamingTickHealth(events)

  // ---- pattern & dispersion screens (wave 13) --------------------------

  /** Candlestick pattern flags (doji / bullish engulfing / hammer) over
    * integer-cent daily bars. Oracle-checked as q_candle_patterns. */
  def candlePatterns(df: DataFrame, keyCol: String, tsCol: String,
                     valCol: String, tieBreak: String): DataFrame =
    queries.Breadth13.candlePatterns(df, keyCol, tsCol, valCol, tieBreak)

  /** Tokens over-indexing where `isTarget` holds vs the rest of the
    * corpus (cross-multiplied integer skew, top-k). Oracle-checked as
    * q_token_skew. */
  def tokenSkew(docs: DataFrame, textCol: String,
                isTarget: org.apache.spark.sql.Column, k: Int = 20): DataFrame =
    queries.Breadth13.tokenSkew(docs, textCol, isTarget, k)

  /** Inter-arrival burstiness (index of dispersion of tick gaps) per
    * series key — the organic-vs-scheduler tripwire. Oracle-checked as
    * q_burstiness. */
  def burstiness(df: DataFrame, keyCol: String, tsCol: String,
                 tieBreak: String): DataFrame =
    queries.Breadth13.burstiness(df, keyCol, tsCol, tieBreak)

  // ---- cross-series structure (wave 14) --------------------------------

  /** Pairwise Pearson correlation of daily closes across the `topKeys`
    * most-active series keys (the correlation-heatmap input), assembled
    * from integer co-moments so the result is engine-exact; the top-N
    * restriction keeps the pair space constant as keys grow.
    * Oracle-checked as q_pair_corr. */
  def pairCorrelation(df: DataFrame, keyCol: String, tsCol: String,
                      valCol: String, tieBreak: String, minDays: Int = 5,
                      topKeys: Int = 20): DataFrame =
    queries.Breadth14.pairCorrelation(df, keyCol, tsCol, valCol, tieBreak,
      minDays, topKeys)

  /** Daily volume-weighted average price, quantity read from the JSON
    * props field. Oracle-checked as q_vwap. */
  def vwap(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
           qtyJsonField: String): DataFrame =
    queries.Breadth14.vwap(df, keyCol, tsCol, valCol, qtyJsonField)

  // ---- retrospective reports (wave 15) ---------------------------------

  /** Best single buy→sell trade per series key (cents) — the backtest
    * floor. Prefix-min recurrence, O(1) state per key. Oracle-checked as
    * q_best_trade. */
  def bestTrade(df: DataFrame, keyCol: String, tsCol: String,
                valCol: String, tieBreak: String): DataFrame =
    queries.Breadth15.bestTrade(df, keyCol, tsCol, valCol, tieBreak)

  /** Daily audience accounting: actives, first-seen, last-seen counts per
    * day — aggregates only, never an event self-join. Oracle-checked as
    * q_user_churn. */
  def userChurn(df: DataFrame, keyCol: String, tsCol: String): DataFrame =
    queries.Breadth15.userChurn(df, keyCol, tsCol)

  /** Streaming twin of [[bestTrade]]: prefix-min + best profit as O(1)
    * keyed state, integer throughout. Spec-pinned equal to the batch
    * form — see streaming.Streams.streamingBestTrade. */
  def liveBestTrade(events: org.apache.spark.sql.Dataset[streaming.EventRow])
      : org.apache.spark.sql.Dataset[streaming.BestTradeSnap] =
    streaming.Streams.streamingBestTrade(events)

  // ---- dashboard digests (wave 16) --------------------------------------

  /** (ISO day-of-week × hour) activity/price grid — the calendar
    * heatmap. ≤168-row aggregate off one scan. Oracle-checked as
    * q_seasonality. */
  def seasonality(df: DataFrame, tsCol: String, valCol: String): DataFrame =
    queries.Breadth16.seasonality(df, tsCol, valCol)

  /** The k largest absolute day-over-day close moves (gainers/losers
    * widget); lag on the bar table, TakeOrdered top-k. Oracle-checked as
    * q_top_movers. */
  def topMovers(df: DataFrame, keyCol: String, tsCol: String,
                valCol: String, tieBreak: String, k: Int = 10): DataFrame =
    queries.Breadth16.topMovers(df, keyCol, tsCol, valCol, tieBreak, k)

  /** Bollinger band screen over the trailing `w` ticks: mid/band values
    * plus breakout flags decided ENTIRELY in the integer domain (the
    * squared, cross-multiplied sigma test) — no float fold order can
    * flip a flag. Oracle-checked as q_bollinger. */
  def bollinger(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                tieBreak: String, w: Int = 5, k: Int = 2): DataFrame =
    queries.Breadth17.bollinger(df, keyCol, tsCol, valCol, tieBreak, w, k)

  /** Streaming twin of [[bollinger]] (w=5, k=2): the prior-window cent
    * buffer as ≤5-deep keyed state, the same integer breakout test —
    * stream and batch agree bit-for-bit. Spec-pinned — see
    * streaming.Streams.streamingBollinger. */
  def liveBollinger(events: org.apache.spark.sql.Dataset[streaming.EventRow])
      : org.apache.spark.sql.Dataset[streaming.BollScored] =
    streaming.Streams.streamingBollinger(events)

  /** Stochastic %K against the prior `w`-tick range — one division of
    * integer cent differences; flat windows unscored. Oracle-checked as
    * q_stochastic. */
  def stochasticK(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String, w: Int = 5): DataFrame =
    queries.Breadth18.stochasticK(df, keyCol, tsCol, valCol, tieBreak, w)

  /** Average true range over the trailing `w` daily bars (simple
    * average, integer cents — the distributed-friendly non-recursive
    * form). Oracle-checked as q_atr. */
  def atr(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String, w: Int = 3): DataFrame =
    queries.Breadth18.atr(df, keyCol, tsCol, valCol, tieBreak, w)

  /** On-balance volume line per key — integer running sum of signed JSON
    * quantities (+q up-tick, −q down-tick, 0 flat/null). Oracle-checked
    * as q_obv. */
  def obv(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String, qtyJsonField: String = "k"): DataFrame =
    queries.Breadth18.obv(df, keyCol, tsCol, valCol, tieBreak, qtyJsonField)

  /** One-factor market beta per key: cov of the key's day-over-day cent
    * diff with the same-day all-keys diff sum, over var of the latter —
    * integer co-moments, one division. Oracle-checked as q_beta. */
  def marketBeta(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                 tieBreak: String): DataFrame =
    queries.Breadth20.marketBeta(df, keyCol, tsCol, valCol, tieBreak)

  /** Aggregate Amihud illiquidity per key: Σ|Δclose cents| / Σ quantity
    * over scored days — integer sums, one division. Oracle-checked as
    * q_amihud. */
  def amihudIlliquidity(df: DataFrame, keyCol: String, tsCol: String,
                        valCol: String, tieBreak: String,
                        qtyJsonField: String = "k"): DataFrame =
    queries.Breadth20.amihudIlliquidity(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)

  /** Roll (1984) implied spread per key from the negative serial
    * covariance of consecutive tick diffs — integer covariance
    * numerator, one division → sqrt. Oracle-checked as q_roll_spread. */
  def rollSpread(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                 tieBreak: String): DataFrame =
    queries.Breadth20.rollSpread(df, keyCol, tsCol, valCol, tieBreak)

  /** Unannualized daily Sharpe per key — mean over std of day-over-day
    * cent moves, collapsed to one integer numerator / one radicand /
    * one division. Oracle-checked as q_sharpe. */
  def dailySharpe(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                  tieBreak: String): DataFrame =
    queries.Breadth20.dailySharpe(df, keyCol, tsCol, valCol, tieBreak)

  /** Streaming twin of [[rollSpread]]: the serial-covariance sums as
    * O(1) keyed state; emitted spread is the batch expression verbatim.
    * Spec-pinned — see streaming.Streams.streamingRollSpread. */
  def liveRollSpread(events: org.apache.spark.sql.Dataset[streaming.EventRow])
      : org.apache.spark.sql.Dataset[streaming.RollSnap] =
    streaming.Streams.streamingRollSpread(events)

  /** Streaming twin of [[dailySharpe]] over the finalized day-bar
    * stream: integer moment sums as O(1) keyed state, running Sharpe
    * per bar. Spec-pinned — see streaming.Streams.streamingDailySharpe. */
  def liveDailySharpe(bars: org.apache.spark.sql.Dataset[streaming.BarRow])
      : org.apache.spark.sql.Dataset[streaming.SharpeScored] =
    streaming.Streams.streamingDailySharpe(bars)

  /** EMA(n) series over daily closes, seeded at the first bar — the
    * per-row recurrence run as a calendar-bounded per-key fold.
    * Oracle-checked as q_ema (DuckDB recursive CTE). */
  def ema(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String, n: Int = 20): DataFrame =
    queries.Breadth19.emaSeries(df, keyCol, tsCol, valCol, tieBreak, n)

  /** MACD(12,26,9) — macd line, signal line, histogram per daily bar.
    * Oracle-checked as q_macd. */
  def macd(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
           tieBreak: String): DataFrame =
    queries.Breadth19.macdSeries(df, keyCol, tsCol, valCol, tieBreak)

  /** Wilder-smoothed RSI(14) — the EMA-recurrence twin of the SMA-based
    * [[rsi]]; null during the 14-diff warm-up. Oracle-checked as
    * q_rsi_wilder. */
  def wilderRsi(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                tieBreak: String): DataFrame =
    queries.Breadth19.wilderRsiSeries(df, keyCol, tsCol, valCol, tieBreak)

  /** Keltner channel per key: EMA-20 midline ± 2 × Wilder ATR-10 with
    * breakout flags — both recurrences in one calendar-bounded fold.
    * Oracle-checked as q_keltner. */
  def keltner(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              tieBreak: String): DataFrame =
    queries.Breadth19.keltnerSeries(df, keyCol, tsCol, valCol, tieBreak)

  /** Streaming twin of [[ema]] + [[macd]]: the four EMA recurrence
    * values as O(1) keyed state over the finalized day-bar stream —
    * stream and batch emit bit-equal doubles. Spec-pinned — see
    * streaming.Streams.streamingEmaMacd. */
  def liveEmaMacd(bars: org.apache.spark.sql.Dataset[streaming.BarRow])
      : org.apache.spark.sql.Dataset[streaming.EmaMacdScored] =
    streaming.Streams.streamingEmaMacd(bars)

  /** Streaming twin of [[wilderRsi]]: previous close + integer warm-up
    * sums + the two Wilder averages as O(1) keyed state. Spec-pinned —
    * see streaming.Streams.streamingWilderRsi. */
  def liveWilderRsi(bars: org.apache.spark.sql.Dataset[streaming.BarRow])
      : org.apache.spark.sql.Dataset[streaming.WilderScored] =
    streaming.Streams.streamingWilderRsi(bars)

  /** Donchian channel per key: `w`-day PRIOR high/low band (integer
    * cents) + breakout flags; midline is the band's one terminal
    * division. */
  def donchian(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
               tieBreak: String, w: Int = queries.Breadth21.W): DataFrame =
    queries.Breadth21.donchian(df, keyCol, tsCol, valCol, tieBreak, w)

  /** Williams %R per key over the trailing `w`-day range (current bar
    * included) — one division of integer cent differences. */
  def williamsR(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                tieBreak: String, w: Int = queries.Breadth21.W): DataFrame =
    queries.Breadth21.williamsR(df, keyCol, tsCol, valCol, tieBreak, w)

  /** Vortex VI+/VI− per key over the trailing `w` diff bars — integer
    * range-movement and true-range sums, two terminal divisions. */
  def vortex(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
             tieBreak: String, w: Int = queries.Breadth21.W): DataFrame =
    queries.Breadth21.vortex(df, keyCol, tsCol, valCol, tieBreak, w)

  /** Money Flow Index per key over the trailing `w` diff bars: ×3
    * typical-price flows weighted by the JSON quantity prop, one
    * terminal division. */
  def mfi(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String, qtyJsonField: String = "k",
          w: Int = queries.Breadth21.W): DataFrame =
    queries.Breadth21.mfi(df, keyCol, tsCol, valCol, tieBreak, qtyJsonField, w)

  /** CCI per key over the trailing `w` bars — the textbook mean-
    * deviation form integer-rescaled by n², one terminal division. */
  def cci(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String, w: Int = queries.Breadth21.W): DataFrame =
    queries.Breadth21.cci(df, keyCol, tsCol, valCol, tieBreak, w)

  /** Wilder's directional movement system per key (DI+/DI−, DX,
    * ADX) — the trend-strength recurrence-of-a-recurrence, one O(L)
    * fold per key over calendar-bounded day bars. */
  def adx(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String): DataFrame =
    queries.Breadth22.adxSeries(df, keyCol, tsCol, valCol, tieBreak)

  /** Streaming twin of [[adx]] over the finalized OHLC day-bar stream:
    * the whole directional-movement accumulator as O(1) keyed state,
    * running the SAME step function as the batch fold. Spec-pinned —
    * see streaming.Streams.streamingAdx. */
  def liveAdx(bars: org.apache.spark.sql.Dataset[streaming.OhlcBarRow])
      : org.apache.spark.sql.Dataset[streaming.AdxScored] =
    streaming.Streams.streamingAdx(bars)

  /** Fixed-iteration integer PageRank over a (src, dst) edge frame —
    * micro-rank units, floor-division damping, bit-exact on any
    * cluster (no float mass to drift). */
  def pageRank(edges: DataFrame, iters: Int = queries.Extensions11.PrIters)
      : DataFrame =
    queries.Extensions11.pageRank(edges, iters)

  /** Int8 scalar quantization of an embedding column (per-vector
    * max-abs scale): emits the dequantized double vectors the scoring
    * math runs on — the 4× ANN memory cut. */
  def quantizeInt8(emb: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame =
    queries.Extensions11.quantizeInt8(emb, idCol, vecCol)

  /** True strength index per key: double EMA smoothing (13, 25) of the
    * day-over-day momentum and its absolute value, one O(L) fold per
    * key over calendar-bounded day bars. */
  def tsi(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String): DataFrame =
    queries.Breadth23.tsiSeries(df, keyCol, tsCol, valCol, tieBreak)

  /** Supertrend per key: Wilder ATR-3 bands with the classic ratchet
    * and flip rule — the trailing-stop overlay. */
  def supertrend(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, tieBreak: String): DataFrame =
    queries.Breadth23.supertrendSeries(df, keyCol, tsCol, valCol, tieBreak)

  /** Streaming twin of [[tsi]] over the finalized day-bar stream —
    * runs the SAME step function as the batch fold. Spec-pinned. */
  def liveTsi(bars: org.apache.spark.sql.Dataset[streaming.BarRow])
      : org.apache.spark.sql.Dataset[streaming.TsiScored] =
    streaming.Streams.streamingTsi(bars)

  /** Streaming twin of [[supertrend]] over the finalized OHLC day-bar
    * stream — the SAME step function as the batch fold. Spec-pinned. */
  def liveSupertrend(bars: org.apache.spark.sql.Dataset[streaming.OhlcBarRow])
      : org.apache.spark.sql.Dataset[streaming.SupertrendScored] =
    streaming.Streams.streamingSupertrend(bars)

  /** Ichimoku cloud per key: integer tenkan/kijun midlines, displaced
    * senkou spans, lagging chikou close — pure windows over day bars. */
  def ichimoku(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
               tieBreak: String): DataFrame =
    queries.Breadth24.ichimoku(df, keyCol, tsCol, valCol, tieBreak)

  /** Aroon up/down/oscillator per key: bars since the window's most
    * recent highest high / lowest low, scaled to 0..100 integers. */
  def aroon(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
            tieBreak: String): DataFrame =
    queries.Breadth24.aroon(df, keyCol, tsCol, valCol, tieBreak)

  /** Heikin-Ashi smoothed candles per key: the dyadic midpoint
    * recurrence, one O(L) fold per key over daily bars. */
  def heikinAshi(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                 tieBreak: String): DataFrame =
    queries.Breadth24.heikinAshi(df, keyCol, tsCol, valCol, tieBreak)

  /** Ulcer index per key: RMS percent drawdown from each window's
    * running peak, integer-quantized squared drawdowns. */
  def ulcer(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
            tieBreak: String): DataFrame =
    queries.Breadth24.ulcer(df, keyCol, tsCol, valCol, tieBreak)

  /** Streaming twin of [[heikinAshi]] over the open-carrying day-bar
    * stream — the SAME step function as the batch fold. Spec-pinned. */
  def liveHeikinAshi(bars: org.apache.spark.sql.Dataset[streaming.Ohlc4BarRow])
      : org.apache.spark.sql.Dataset[streaming.HaScored] =
    streaming.Streams.streamingHeikinAshi(bars)

  /** Historical VaR + expected shortfall per key from the exact
    * ceil(n/5) day-move tail — order statistics, no interpolation. */
  def varEs(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
            tieBreak: String): DataFrame =
    queries.Breadth25.varEs(df, keyCol, tsCol, valCol, tieBreak)

  /** Spearman rank correlation per key between daily close and traded
    * quantity (tie-free rank permutations, one terminal division). */
  def spearman(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
               tieBreak: String, qtyJsonField: String = "k"): DataFrame =
    queries.Breadth25.spearman(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)

  /** Kendall tau per key between daily close and traded quantity, via
    * the O(L log L) merge-sort inversion count. */
  def kendall(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              tieBreak: String, qtyJsonField: String = "k"): DataFrame =
    queries.Breadth25.kendall(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)

  /** Rescaled-range (Hurst R/S) statistic per key over day moves, with
    * the single-window exponent proxy. */
  def hurstRs(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              tieBreak: String): DataFrame =
    queries.Breadth25.hurstRs(df, keyCol, tsCol, valCol, tieBreak)

  /** Modal cent value per group with the deterministic smallest-value
    * tie stance. */
  def modeBy(df: DataFrame, grpCol: String, valCol: String): DataFrame =
    queries.Breadth26.modeBy(df, grpCol, valCol)

  /** Ordered LISTAGG of the distinct tags per key (sorted, comma-joined
    * — the order-free distributed form). */
  def stringAgg(df: DataFrame, keyCol: String, tagCol: String): DataFrame =
    queries.Breadth26.stringAgg(df, keyCol, tagCol)

  /** BIT_AND / BIT_OR / BIT_XOR folds per group over integer cents. */
  def bitwiseAgg(df: DataFrame, grpCol: String, valCol: String): DataFrame =
    queries.Breadth26.bitwiseAgg(df, grpCol, valCol)

  /** Per-key OLS trend of daily closes vs the day index: slope,
    * intercept, r² from re-based integer co-moments. */
  def olsTrend(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
               tieBreak: String): DataFrame =
    queries.Breadth26.olsTrend(df, keyCol, tsCol, valCol, tieBreak)

  /** Deterministic two-round quantized k-means over an embedding table
    * (md5-ordered seeds, integer distances, broadcast centroids). */
  def kmeansAssign(embeddings: DataFrame): DataFrame =
    queries.Extensions12.kmeansAssign(embeddings)

  /** DSIR-style importance weights toward a target language slice (the
    * add-one-smoothed per-token log likelihood ratio, summed per doc). */
  def dsirWeights(docs: DataFrame, targetLang: String = "en"): DataFrame =
    queries.Extensions12.dsirWeights(docs, targetLang)

  /** Chaikin money flow per key: windowed quantized money-flow volume
    * over volume (doji bars contribute zero). */
  def cmf(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String, qtyJsonField: String = "k"): DataFrame =
    queries.Breadth27.cmf(df, keyCol, tsCol, valCol, tieBreak, qtyJsonField)

  /** Detrended price oscillator per key: half-window-lagged close minus
    * the window SMA, integer until one terminal division. */
  def dpo(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String): DataFrame =
    queries.Breadth27.dpo(df, keyCol, tsCol, valCol, tieBreak)

  /** Elder force index per key: day move × volume with its EMA13, one
    * O(L) fold per key over volume-carrying daily bars. */
  def forceIndex(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, tieBreak: String,
                 qtyJsonField: String = "k"): DataFrame =
    queries.Breadth27.forceIndex(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)

  /** Accumulation/distribution line + Chaikin oscillator per key: the
    * integer ADL running sum and EMA3−EMA10 over it. */
  def adlChaikin(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, tieBreak: String,
                 qtyJsonField: String = "k"): DataFrame =
    queries.Breadth27.adlChaikin(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)

  /** Streaming twin of [[forceIndex]] over the volume-carrying day-bar
    * stream — the SAME step function as the batch fold. Spec-pinned. */
  def liveForceIndex(bars: org.apache.spark.sql.Dataset[streaming.VolBarRow])
      : org.apache.spark.sql.Dataset[streaming.FiScored] =
    streaming.Streams.streamingForceIndex(bars)

  /** Streaming twin of [[adlChaikin]] — the SAME money-flow quantum and
    * fold step as the batch form. Spec-pinned. */
  def liveChaikinOsc(bars: org.apache.spark.sql.Dataset[streaming.VolBarRow])
      : org.apache.spark.sql.Dataset[streaming.AdlScored] =
    streaming.Streams.streamingChaikinOsc(bars)

  /** Fosback NVI/PVI per key: volume-direction-gated multiplicative
    * indices over daily bars, both seeded at 1000. */
  def nviPvi(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
             tieBreak: String, qtyJsonField: String = "k"): DataFrame =
    queries.Breadth28.nviPvi(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)

  /** TRIX per key: triple-EMA rate of change (null on the seed bar). */
  def trix(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
           tieBreak: String): DataFrame =
    queries.Breadth28.trix(df, keyCol, tsCol, valCol, tieBreak)

  /** KAMA per key: efficiency-ratio-adaptive moving average (null
    * during the w-bar warm-up). */
  def kama(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
           tieBreak: String): DataFrame =
    queries.Breadth28.kama(df, keyCol, tsCol, valCol, tieBreak)

  /** Mass index per key: window-summed EMA-ratio of bar ranges. */
  def massIndex(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                tieBreak: String): DataFrame =
    queries.Breadth28.massIndex(df, keyCol, tsCol, valCol, tieBreak)

  /** DEMA(10) per key: Mulloy's lag-compensated double EMA — the
    * Recurrence combinator's new-indicator template (one step function,
    * batch + stream). Oracle-checked as q_dema. */
  def dema(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
           tieBreak: String): DataFrame =
    queries.Breadth28.dema(df, keyCol, tsCol, valCol, tieBreak)

  /** Streaming twin of [[dema]] — the SAME step function as the batch
    * fold. Spec-pinned. */
  def liveDema(bars: org.apache.spark.sql.Dataset[streaming.BarRow])
      : org.apache.spark.sql.Dataset[streaming.DemaScored] =
    streaming.Streams.streamingDema(bars)

  /** PPO(12,26) per key: MACD normalized to the slow EMA — scale-free
    * momentum, comparable across price levels. Oracle-checked as
    * q_ppo. */
  def ppo(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String): DataFrame =
    queries.Breadth28.ppo(df, keyCol, tsCol, valCol, tieBreak)

  /** Streaming twin of [[ppo]] — the SAME step function. Spec-pinned. */
  def livePpo(bars: org.apache.spark.sql.Dataset[streaming.BarRow])
      : org.apache.spark.sql.Dataset[streaming.PpoScored] =
    streaming.Streams.streamingPpo(bars)

  /** Information ratio per key vs the daily cross-sectional median
    * move. Oracle-checked as q_info_ratio. */
  def infoRatio(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                tieBreak: String): DataFrame =
    queries.Breadth67.infoRatio(df, keyCol, tsCol, valCol, tieBreak)

  /** Correlogram per key: day-move autocorrelation at lags 1..maxLag.
    * Oracle-checked as q_acf. */
  def acf(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String, maxLag: Int = 5): DataFrame =
    queries.Breadth67.acf(df, keyCol, tsCol, valCol, tieBreak, maxLag)

  /** Efraimidis-Spirakis weighted top-k sample per stratum (w = `wCol`,
    * RNG-free md5 uniforms). Oracle-checked as q_weighted_sample. */
  def weightedSample(df: DataFrame, stratCol: String, idCol: String,
                     wCol: String, k: Int): DataFrame =
    queries.Breadth67.weightedSample(df, stratCol, idCol, wCol, k)

  /** Jarque-Bera normality test per key over day moves (exact decimal
    * power sums). Oracle-checked as q_jarque_bera. */
  def jarqueBera(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                 tieBreak: String): DataFrame =
    queries.Breadth68.jarqueBera(df, keyCol, tsCol, valCol, tieBreak)

  /** Newman degree assortativity of an undirected (id_a, id_b) edge
    * list. Oracle-checked as q_assortativity (kNN embedding graph). */
  def assortativity(edges: DataFrame): DataFrame =
    queries.Breadth68.assortativity(edges)

  /** Exact p10/p90 day-move order statistics per key + tail ratio.
    * Oracle-checked as q_tail_ratio. */
  def tailRatio(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                tieBreak: String): DataFrame =
    queries.Breadth68.tailRatio(df, keyCol, tsCol, valCol, tieBreak)

  /** RiskMetrics EWMA volatility (λ = 0.94) per key over day moves.
    * Oracle-checked as q_ewma_vol. */
  def ewmaVol(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              tieBreak: String): DataFrame =
    queries.Breadth69.ewmaVol(df, keyCol, tsCol, valCol, tieBreak)

  /** Streaming twin of [[ewmaVol]] — the SAME step function.
    * Spec-pinned. */
  def liveEwmaVol(bars: org.apache.spark.sql.Dataset[streaming.BarRow])
      : org.apache.spark.sql.Dataset[streaming.EwmaVolScored] =
    streaming.Streams.streamingEwmaVol(bars)

  /** QStick(k): SMA of the candle body (close − open) per key.
    * Oracle-checked as q_qstick. */
  def qstick(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
             tieBreak: String, k: Int = 5): DataFrame =
    queries.Breadth69.qstick(df, keyCol, tsCol, valCol, tieBreak, k)

  /** Williams fractal swing highs/lows per key (±2-bar neighbourhood).
    * Oracle-checked as q_fractals. */
  def fractals(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
               tieBreak: String): DataFrame =
    queries.Breadth69.fractals(df, keyCol, tsCol, valCol, tieBreak)

  /** Jensen's alpha + Treynor ratio per key vs the q_beta market
    * factor. Oracle-checked as q_jensen_alpha. */
  def jensenAlpha(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String): DataFrame =
    queries.Breadth70.jensenAlpha(df, keyCol, tsCol, valCol, tieBreak)

  /** Day-of-week anomaly: mean move + up-share per ISO weekday.
    * Oracle-checked as q_weekday_effect. */
  def weekdayEffect(df: DataFrame, keyCol: String, tsCol: String,
                    valCol: String, tieBreak: String): DataFrame =
    queries.Breadth70.weekdayEffect(df, keyCol, tsCol, valCol, tieBreak)

  /** Per-source unigram KL divergence vs the corpus (microbit-
    * quantized). Oracle-checked as q_kl_source. */
  def klSource(docs: DataFrame, srcCol: String, textCol: String): DataFrame =
    queries.Breadth70.klSource(docs, srcCol, textCol)

  /** Awesome Oscillator (fast/slow midpoint SMAs) per key.
    * Oracle-checked as q_awesome_osc. */
  def awesomeOsc(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, tieBreak: String,
                 fast: Int = 3, slow: Int = 13): DataFrame =
    queries.Breadth71.awesomeOsc(df, keyCol, tsCol, valCol, tieBreak,
      fast, slow)

  /** Mann-Whitney U test of each stratum's metric vs the rest.
    * Oracle-checked as q_mann_whitney. */
  def mannWhitney(df: DataFrame, stratCol: String, vCol: String): DataFrame =
    queries.Breadth71.mannWhitney(df, stratCol, vCol)

  /** Theil T inequality index over per-key summed cents.
    * Oracle-checked as q_theil_index. */
  def theilIndex(df: DataFrame, keyCol: String,
                 amountCents: org.apache.spark.sql.Column): DataFrame =
    queries.Breadth71.theilIndex(df, keyCol, amountCents)

  /** Cross-correlation of each key's move vs the market move at lags
    * 0..maxLag. Oracle-checked as q_xcf. */
  def xcf(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String, maxLag: Int = 3): DataFrame =
    queries.Breadth72.xcf(df, keyCol, tsCol, valCol, tieBreak, maxLag)

  /** Hill tail-index estimator over the k largest |day moves| per key.
    * Oracle-checked as q_hill_tail. */
  def hillTail(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
               tieBreak: String, k: Int = 10): DataFrame =
    queries.Breadth72.hillTail(df, keyCol, tsCol, valCol, tieBreak, k)

  /** Opening-gap event study: gaps + their fill days.
    * Oracle-checked as q_gap_fill. */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              tieBreak: String): DataFrame =
    queries.Breadth72.gapFill(df, keyCol, tsCol, valCol, tieBreak)

  /** Mean-variance + win/loss Kelly fractions per key.
    * Oracle-checked as q_kelly. */
  def kelly(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
            tieBreak: String): DataFrame =
    queries.Breadth73.kelly(df, keyCol, tsCol, valCol, tieBreak)

  /** Up/down market capture per key (aggregate-ratio form).
    * Oracle-checked as q_capture_ratio. */
  def captureRatio(df: DataFrame, keyCol: String, tsCol: String,
                   valCol: String, tieBreak: String): DataFrame =
    queries.Breadth73.captureRatio(df, keyCol, tsCol, valCol, tieBreak)

  /** Pain index (mean + max drawdown below the running peak).
    * Oracle-checked as q_pain_index. */
  def painIndex(df: DataFrame, keyCol: String, tsCol: String,
                valCol: String, tieBreak: String): DataFrame =
    queries.Breadth73.painIndex(df, keyCol, tsCol, valCol, tieBreak)

  /** Simpson diversity of each source's unigram distribution.
    * Oracle-checked as q_simpson_diversity. */
  def simpsonDiversity(docs: DataFrame, srcCol: String,
                       textCol: String): DataFrame =
    queries.Breadth74.simpsonDiversity(docs, srcCol, textCol)

  /** Exact p25/p50/p75 order statistics of a metric per stratum.
    * Oracle-checked as q_length_quartiles. */
  def lengthQuartiles(df: DataFrame, stratCol: String, vCol: String,
                      idCol: String): DataFrame =
    queries.Breadth74.lengthQuartiles(df, stratCol, vCol, idCol)

  /** Fixed-window type-token ratio per doc.
    * Oracle-checked as q_ttr_window. */
  def ttrWindow(docs: DataFrame, idCol: String, textCol: String,
                w: Int = 100): DataFrame =
    queries.Breadth74.ttrWindow(docs, idCol, textCol, w)

  /** OLS slope + R² of close vs bar index per key.
    * Oracle-checked as q_trend_r2. */
  def trendR2(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              tieBreak: String): DataFrame =
    queries.Breadth75.trendR2(df, keyCol, tsCol, valCol, tieBreak)

  /** Volatility regime flags (w-bar move energy vs full sample).
    * Oracle-checked as q_vol_regime. */
  def volRegime(df: DataFrame, keyCol: String, tsCol: String,
                valCol: String, tieBreak: String, w: Int = 5): DataFrame =
    queries.Breadth75.volRegime(df, keyCol, tsCol, valCol, tieBreak, w)

  /** Shannon entropy of the up/down/flat sign distribution per key.
    * Oracle-checked as q_sign_entropy. */
  def signEntropy(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String): DataFrame =
    queries.Breadth75.signEntropy(df, keyCol, tsCol, valCol, tieBreak)

  /** Streaming twin of [[qstick]] — an O(k) candle-body ring.
    * Spec-pinned. */
  def liveQstick(bars: org.apache.spark.sql.Dataset[streaming.FullBarRow],
                 k: Int = 5)
      : org.apache.spark.sql.Dataset[streaming.QstickScored] =
    streaming.Streams.streamingQstick(bars, k)

  /** Streaming twin of [[fractals]] — a 5-bar ring with the two-bar
    * confirmation lag. Spec-pinned. */
  def liveFractals(bars: org.apache.spark.sql.Dataset[streaming.FullBarRow])
      : org.apache.spark.sql.Dataset[streaming.FractalScored] =
    streaming.Streams.streamingFractals(bars)

  /** Lag-1 rank ACF of move magnitude (the Spearman-robust ARCH
    * screen). Oracle-checked as q_arch_effect. */
  def archEffect(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, tieBreak: String): DataFrame =
    queries.Breadth76.archEffect(df, keyCol, tsCol, valCol, tieBreak)

  /** Ljung-Box Q(5) portmanteau test on day moves per key.
    * Oracle-checked as q_ljung_box. */
  def ljungBox(df: DataFrame, keyCol: String, tsCol: String,
               valCol: String, tieBreak: String): DataFrame =
    queries.Breadth76.ljungBox(df, keyCol, tsCol, valCol, tieBreak)

  /** AR(1) mean-reversion half-life per key.
    * Oracle-checked as q_half_life. */
  def halfLife(df: DataFrame, keyCol: String, tsCol: String,
               valCol: String, tieBreak: String): DataFrame =
    queries.Breadth76.halfLife(df, keyCol, tsCol, valCol, tieBreak)

  /** Exact-dup doc/token accounting per source.
    * Oracle-checked as q_dup_inflation. */
  def dupInflation(docs: DataFrame, srcCol: String, idCol: String,
                   textCol: String): DataFrame =
    queries.Breadth77.dupInflation(docs, srcCol, idCol, textCol)

  /** First-k-token template clusters per source.
    * Oracle-checked as q_prefix_dup. */
  def prefixDup(docs: DataFrame, srcCol: String, textCol: String,
                k: Int = 5): DataFrame =
    queries.Breadth77.prefixDup(docs, srcCol, textCol, k)

  /** Letter/digit/space/other character shares per source.
    * Oracle-checked as q_char_classes. */
  def charClasses(docs: DataFrame, srcCol: String,
                  textCol: String): DataFrame =
    queries.Breadth77.charClasses(docs, srcCol, textCol)

  /** Monthly seasonal (mean move + up-share per calendar month).
    * Oracle-checked as q_month_effect. */
  def monthEffect(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String): DataFrame =
    queries.Breadth78.monthEffect(df, keyCol, tsCol, valCol, tieBreak)

  /** Drawdown episode count + mean length per key.
    * Oracle-checked as q_dd_episodes. */
  def ddEpisodes(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, tieBreak: String): DataFrame =
    queries.Breadth78.ddEpisodes(df, keyCol, tsCol, valCol, tieBreak)

  /** Peak-over-threshold |move| exceedance counts per key.
    * Oracle-checked as q_pot_exceed. */
  def potExceed(df: DataFrame, keyCol: String, tsCol: String,
                valCol: String, tieBreak: String): DataFrame =
    queries.Breadth78.potExceed(df, keyCol, tsCol, valCol, tieBreak)

  /** Rolling w-bar Pearson of key move vs the market move.
    * Oracle-checked as q_rolling_corr. */
  def rollingCorr(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String, w: Int = 10): DataFrame =
    queries.Breadth79.rollingCorr(df, keyCol, tsCol, valCol, tieBreak, w)

  /** Mean h-day cumulative move after >4×median shocks.
    * Oracle-checked as q_event_drift. */
  def eventDrift(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, tieBreak: String, h: Int = 3): DataFrame =
    queries.Breadth79.eventDrift(df, keyCol, tsCol, valCol, tieBreak, h)

  /** Mean |tick move| by hour of day.
    * Oracle-checked as q_intraday_activity. */
  def intradayActivity(df: DataFrame, keyCol: String, tsCol: String,
                       valCol: String, tieBreak: String): DataFrame =
    queries.Breadth79.intradayActivity(df, keyCol, tsCol, valCol, tieBreak)

  /** Pooled rank information coefficient of the 1-day momentum signal.
    * Oracle-checked as q_signal_ic. */
  def signalIc(df: DataFrame, keyCol: String, tsCol: String,
               valCol: String, tieBreak: String): DataFrame =
    queries.Breadth80.signalIc(df, keyCol, tsCol, valCol, tieBreak)

  /** Per-key Pearson of |day move| vs day traded volume.
    * Oracle-checked as q_volume_move_corr. */
  def volumeMoveCorr(df: DataFrame, keyCol: String, tsCol: String,
                     valCol: String, tieBreak: String,
                     qtyJsonField: String): DataFrame =
    queries.Breadth80.volumeMoveCorr(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)

  /** Order fulfilment span rolled up per order priority.
    * Oracle-checked as q_order_fill_span. */
  def orderFillSpan(orders: DataFrame, lineitem: DataFrame): DataFrame =
    queries.Breadth80.orderFillSpan(orders, lineitem)

  /** Top-k open-revenue backlog for one customer segment (the TPC-H Q3
    * skeleton). Oracle-checked as q_segment_backlog. */
  def segmentBacklog(customer: DataFrame, orders: DataFrame,
                     lineitem: DataFrame, segment: String,
                     cutoff: String = "1998-01-01", k: Int = 10): DataFrame =
    queries.Breadth81.segmentBacklog(customer, orders, lineitem, segment,
      cutoff, k)

  /** Per-priority any-line-late order counts (the TPC-H Q4 skeleton).
    * Oracle-checked as q_late_priority. */
  def latePriority(orders: DataFrame, lineitem: DataFrame,
                   lateDays: Int = 90): DataFrame =
    queries.Breadth81.latePriority(orders, lineitem, lateDays)

  /** Exact revenue by customer nation (the TPC-H Q5 skeleton).
    * Oracle-checked as q_nation_revenue. */
  def nationRevenue(nation: DataFrame, customer: DataFrame,
                    orders: DataFrame, lineitem: DataFrame): DataFrame =
    queries.Breadth81.nationRevenue(nation, customer, orders, lineitem)

  /** Bilateral supplier-nation↔customer-nation revenue per ship year
    * (the TPC-H Q7 skeleton). Oracle-checked as q_volume_shipping. */
  def volumeShipping(nation: DataFrame, supplier: DataFrame,
                     customer: DataFrame, orders: DataFrame,
                     lineitem: DataFrame, nationA: String,
                     nationB: String): DataFrame =
    queries.Breadth95.volumeShipping(nation, supplier, customer, orders,
      lineitem, nationA, nationB)

  /** One nation's revenue share of a part type sold into a region, per
    * order year (the TPC-H Q8 skeleton). Oracle-checked as
    * q_market_share. */
  def marketShare(region: DataFrame, nation: DataFrame, supplier: DataFrame,
                  customer: DataFrame, orders: DataFrame,
                  lineitem: DataFrame, part: DataFrame, shareNation: String,
                  regionName: String, pType: String): DataFrame =
    queries.Breadth95.marketShare(region, nation, supplier, customer,
      orders, lineitem, part, shareNation, regionName, pType)

  /** Ship-delay buckets × high/low order-priority line counts (the
    * TPC-H Q12 skeleton). Oracle-checked as q_priority_delay. */
  def priorityDelay(orders: DataFrame, lineitem: DataFrame): DataFrame =
    queries.Breadth95.priorityDelay(orders, lineitem)

  /** Customer order-count distribution, zero-order customers kept (the
    * TPC-H Q13 skeleton). Oracle-checked as q_custdist. */
  def custdist(customer: DataFrame, orders: DataFrame): DataFrame =
    queries.Breadth95.custdist(customer, orders)

  /** Cheapest observed supplier per part under a size/type screen (the
    * TPC-H Q2 skeleton). Oracle-checked as q_min_cost_supplier. */
  def minCostSupplier(part: DataFrame, supplier: DataFrame,
                      nation: DataFrame, lineitem: DataFrame, pType: String,
                      maxSize: Int): DataFrame =
    queries.Breadth96.minCostSupplier(part, supplier, nation, lineitem,
      pType, maxSize)

  /** Exact profit by supplier nation × order year over one part-name
    * prefix (the TPC-H Q9 skeleton). Oracle-checked as
    * q_product_profit. */
  def productProfit(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                    orders: DataFrame, lineitem: DataFrame,
                    namePrefix: String): DataFrame =
    queries.Breadth96.productProfit(part, supplier, nation, orders,
      lineitem, namePrefix)

  /** Supplier(s) with the max exact revenue over one quarter (the
    * TPC-H Q15 skeleton). Oracle-checked as q_top_supplier. */
  def topSupplier(supplier: DataFrame, lineitem: DataFrame,
                  start: String): DataFrame =
    queries.Breadth96.topSupplier(supplier, lineitem, start)

  /** Avg weekly revenue in sub-20%-of-average-quantity lines of one
    * brand (the TPC-H Q17 skeleton). Oracle-checked as
    * q_small_qty_revenue. */
  def smallQtyRevenue(part: DataFrame, lineitem: DataFrame,
                      brand: String): DataFrame =
    queries.Breadth96.smallQtyRevenue(part, lineitem, brand)

  /** Parts whose exact revenue exceeds (pct10/10)× the average part
    * revenue, cross-multiplied (the TPC-H Q11 skeleton with a
    * scale-invariant threshold). Oracle-checked as q_important_parts. */
  def importantParts(lineitem: DataFrame, pct10: Int = 15): DataFrame =
    queries.Breadth97.importantParts(lineitem, pct10)

  /** Distinct non-blacklisted suppliers per (brand, type, size) (the
    * TPC-H Q16 skeleton). Oracle-checked as q_supplier_part_counts. */
  def supplierPartCounts(part: DataFrame, supplier: DataFrame,
                         lineitem: DataFrame, minAcct: Double): DataFrame =
    queries.Breadth97.supplierPartCounts(part, supplier, lineitem, minAcct)

  /** Exact revenue under an OR of brand×qty×size conjunctions (the
    * TPC-H Q19 skeleton). Oracle-checked as q_disjunctive_revenue. */
  def disjunctiveRevenue(part: DataFrame, lineitem: DataFrame): DataFrame =
    queries.Breadth97.disjunctiveRevenue(part, lineitem)

  /** Suppliers shipping >1.5× the per-supplier part average in a year
    * (the TPC-H Q20 skeleton). Oracle-checked as q_excess_shippers. */
  def excessShippers(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                     lineitem: DataFrame, namePrefix: String,
                     shipYear: Int): DataFrame =
    queries.Breadth97.excessShippers(part, supplier, nation, lineitem,
      namePrefix, shipYear)

  /** Sole-late-supplier wait counts over multi-supplier orders (the
    * TPC-H Q21 skeleton). Oracle-checked as q_waiting_suppliers. */
  def waitingSuppliers(supplier: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, lateDays: Int = 60,
                       k: Int = 10): DataFrame =
    queries.Breadth97.waitingSuppliers(supplier, orders, lineitem, lateDays,
      k)

  /** Per nation, rich customers with no order since the cutoff (the
    * TPC-H Q22 skeleton). Oracle-checked as q_idle_customers. */
  def idleCustomers(customer: DataFrame, orders: DataFrame,
                    nation: DataFrame, cutoff: String): DataFrame =
    queries.Breadth97.idleCustomers(customer, orders, nation, cutoff)

  /** Welch's unequal-variance t between two groups of `grpCol`.
    * Oracle-checked as q_welch_t. */
  def welchT(df: DataFrame, grpCol: String, valCol: String, a: String,
             b: String): DataFrame =
    queries.Breadth98.welchT(df, grpCol, valCol, a, b)

  /** Brown–Forsythe Levene test (median-based dispersion ANOVA).
    * Oracle-checked as q_levene_bf. */
  def leveneBF(df: DataFrame, grpCol: String, valCol: String): DataFrame =
    queries.Breadth98.leveneBF(df, grpCol, valCol)

  /** Grubbs' max-studentized-deviation outlier score per group.
    * Oracle-checked as q_grubbs. */
  def grubbs(df: DataFrame, grpCol: String, valCol: String): DataFrame =
    queries.Breadth98.grubbs(df, grpCol, valCol)

  /** Tie-robust Chatterjee ξ (time → value dependence) per key.
    * Oracle-checked as q_chatterjee_xi. */
  def chatterjeeXi(df: DataFrame, keyCol: String, tsCol: String,
                   valCol: String, tieBreak: String): DataFrame =
    queries.Breadth98.chatterjeeXi(df, keyCol, tsCol, valCol, tieBreak)

  /** Wilcoxon signed-rank z over per-(key, day) open→close moves.
    * Oracle-checked as q_wilcoxon_signed. */
  def wilcoxonSigned(df: DataFrame, keyCol: String, tsCol: String,
                     valCol: String, tieBreak: String): DataFrame =
    queries.Breadth98.wilcoxonSigned(df, keyCol, tsCol, valCol, tieBreak)

  /** Additive Holt–Winters(7) level/trend/weekday-season per key.
    * Oracle-checked as q_holt_winters. */
  def holtWinters(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String): DataFrame =
    queries.Breadth99.holtWinters(df, keyCol, tsCol, valCol, tieBreak)

  /** Croston's intermittent-demand forecast over positive day demands.
    * Oracle-checked as q_croston. */
  def croston(df: DataFrame, keyCol: String, tsCol: String,
              qtyJsonField: String): DataFrame =
    queries.Breadth99.croston(df, keyCol, tsCol, qtyJsonField)

  /** Theta-method θ=2 line + SES per key over day bars.
    * Oracle-checked as q_theta. */
  def theta(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
            tieBreak: String): DataFrame =
    queries.Breadth99.theta(df, keyCol, tsCol, valCol, tieBreak)

  /** Per-type adoption curve: daily new + cumulative first-time users.
    * Oracle-checked as q_feature_adoption. */
  def featureAdoption(df: DataFrame, keyCol: String, tsCol: String,
                      typeCol: String): DataFrame =
    queries.Breadth100.featureAdoption(df, keyCol, tsCol, typeCol)

  /** Day-N retention at N ∈ {1,7,14,28}. Oracle-checked as
    * q_dayn_retention. */
  def daynRetention(df: DataFrame, keyCol: String, tsCol: String): DataFrame =
    queries.Breadth100.daynRetention(df, keyCol, tsCol)

  /** Rank-exact p50/p90 of 30-min-gap session durations.
    * Oracle-checked as q_session_quantiles. */
  def sessionQuantiles(df: DataFrame, keyCol: String, tsCol: String,
                       tieBreak: String): DataFrame =
    queries.Breadth100.sessionQuantiles(df, keyCol, tsCol, tieBreak)

  /** Exact mean / p50 / p90 of per-key repeat-event day gaps.
    * Oracle-checked as q_repeat_interval. */
  def repeatInterval(df: DataFrame, keyCol: String, tsCol: String,
                     typeCol: String, typeVal: String): DataFrame =
    queries.Breadth100.repeatInterval(df, keyCol, tsCol, typeCol, typeVal)

  /** Exact trailing-window median of day-bar closes per key.
    * Oracle-checked as q_rolling_median. */
  def rollingMedian(df: DataFrame, keyCol: String, tsCol: String,
                    valCol: String, tieBreak: String,
                    win: Int = 7): DataFrame =
    queries.Breadth101.rollingMedian(df, keyCol, tsCol, valCol, tieBreak,
      win)

  /** k-core of the mutual within-label kNN graph after bounded peel rounds.
    * Oracle-checked as q_kcore. */
  def kcore(emb: DataFrame, k: Long = 2L, rounds: Int = 8): DataFrame =
    queries.Breadth101.kcore(emb, k, rounds)

  /** Rank-exact 10%-per-side trimmed mean per group. Oracle-checked as
    * q_trimmed_mean. */
  def trimmedMean(df: DataFrame, grpCol: String, valCol: String): DataFrame =
    queries.Breadth101.trimmedMean(df, grpCol, valCol)

  /** BM25 top-k of documents against the fixed three-term query.
    * Oracle-checked as q_bm25. */
  /** Tukey 1.5·IQR outlier fences per group, rank- and int64-exact.
    * Oracle-checked as q_iqr_outliers. */
  def iqrOutliers(df: DataFrame, grpCol: String, valCol: String): DataFrame =
    queries.Breadth103.iqrOutliers(df, grpCol, valCol)

  /** Process-capability Cpk per group against the fixed spec band.
    * Oracle-checked as q_cpk. */
  def cpk(df: DataFrame, grpCol: String, valCol: String): DataFrame =
    queries.Breadth103.cpk(df, grpCol, valCol)

  /** Corwin–Schultz 2-day high-low spread proxy per key-day.
    * Oracle-checked as q_cs_spread. */
  def csSpread(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
               tieBreak: String): DataFrame =
    queries.Breadth103.csSpread(df, keyCol, tsCol, valCol, tieBreak)

  /** Daily rank-exact p10/p50/p90 bands of the key cross-section.
    * Oracle-checked as q_percentile_bands. */
  def percentileBands(df: DataFrame, keyCol: String, tsCol: String,
                      valCol: String, tieBreak: String): DataFrame =
    queries.Breadth104.percentileBands(df, keyCol, tsCol, valCol, tieBreak)

  /** Jaccard of bottom-decile crash-day sets per key pair, top 15.
    * Oracle-checked as q_tail_dependence. */
  def tailDependence(df: DataFrame, keyCol: String, tsCol: String,
                     valCol: String, tieBreak: String,
                     k: Int = 15): DataFrame =
    queries.Breadth104.tailDependence(df, keyCol, tsCol, valCol, tieBreak,
      k)

  /** One-factor beta estimated on market-down days only.
    * Oracle-checked as q_beta_downside. */
  def downsideBeta(df: DataFrame, keyCol: String, tsCol: String,
                   valCol: String, tieBreak: String): DataFrame =
    queries.Breadth104.downsideBeta(df, keyCol, tsCol, valCol, tieBreak)

  /** Quantity-weighted median line price per brand. Oracle-checked as
    * q_weighted_median. */
  def weightedMedian(part: DataFrame, lineitem: DataFrame): DataFrame =
    queries.Breadth105.weightedMedian(part, lineitem)

  /** Top consecutive-order dominant-type transitions. Oracle-checked
    * as q_category_transitions. */
  def categoryTransitions(orders: DataFrame, lineitem: DataFrame,
                          part: DataFrame, k: Int = 20): DataFrame =
    queries.Breadth105.categoryTransitions(orders, lineitem, part, k)

  /** Rising/falling census of per-customer spend OLS slopes.
    * Oracle-checked as q_spend_trajectory. */
  def spendTrajectory(orders: DataFrame): DataFrame =
    queries.Breadth105.spendTrajectory(orders)

  /** Trailing volume-weighted moving average per key-day.
    * Oracle-checked as q_vwma. */
  def vwma(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
           tieBreak: String, qtyJsonField: String, n: Int = 10): DataFrame =
    queries.Breadth106.vwma(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField, n)

  /** SMA envelope with integer-exact breakout flags. Oracle-checked as
    * q_envelope. */
  def envelope(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
               tieBreak: String, n: Int = 20,
               permille: Long = 25L): DataFrame =
    queries.Breadth106.envelope(df, keyCol, tsCol, valCol, tieBreak, n,
      permille)

  /** Disparity index 100·close/SMA per key-day. Oracle-checked as
    * q_disparity. */
  def disparity(df: DataFrame, keyCol: String, tsCol: String,
                valCol: String, tieBreak: String, n: Int = 13): DataFrame =
    queries.Breadth106.disparity(df, keyCol, tsCol, valCol, tieBreak, n)

  /** Global top-k centroid-proxy hard negatives for contrastive
    * training. Oracle-checked as q_hard_negatives. */
  def hardNegatives(emb: DataFrame, k: Int = 20): DataFrame =
    queries.Breadth107.hardNegatives(emb, k)

  /** Mann–Kendall trend test per key (tie-corrected, continuity z).
    * Oracle-checked as q_mann_kendall. */
  def mannKendall(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String): DataFrame =
    queries.Breadth108.mannKendall(df, keyCol, tsCol, valCol, tieBreak)

  /** Poisson(1) bootstrap CI of the mean day move per key.
    * Oracle-checked as q_poisson_bootstrap. */
  def poissonBootstrap(df: DataFrame, keyCol: String, tsCol: String,
                       valCol: String, tieBreak: String,
                       nBoot: Int = 32): DataFrame =
    queries.Breadth108.poissonBootstrap(df, keyCol, tsCol, valCol,
      tieBreak, nBoot)

  /** Cliff's δ effect size between two groups (count-table exact).
    * Oracle-checked as q_cliffs_delta. */
  def cliffsDelta(df: DataFrame, grpCol: String, valCol: String, a: String,
                  b: String): DataFrame =
    queries.Breadth108.cliffsDelta(df, grpCol, valCol, a, b)

  /** 1-Wasserstein distance between two groups' value distributions.
    * Oracle-checked as q_wasserstein1. */
  def wasserstein1(df: DataFrame, grpCol: String, valCol: String, a: String,
                   b: String): DataFrame =
    queries.Breadth109.wasserstein1(df, grpCol, valCol, a, b)

  /** Squared energy distance between two groups on an int column.
    * Oracle-checked as q_energy_distance. */
  def energyDistance(docs: DataFrame, grpCol: String, numCol: String,
                     a: String, b: String): DataFrame =
    queries.Breadth109.energyDistance(docs, grpCol, numCol, a, b)

  /** Rank-exact decile QQ table between two groups. Oracle-checked as
    * q_qq_deciles. */
  def qqDeciles(docs: DataFrame, grpCol: String, numCol: String, a: String,
                b: String): DataFrame =
    queries.Breadth109.qqDeciles(docs, grpCol, numCol, a, b)

  /** PACF at lags 1–3 per key (Durbin–Levinson over exact-moment lag
    * correlations). Oracle-checked as q_pacf. */
  def pacf(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
           tieBreak: String): DataFrame =
    queries.Breadth110.pacf(df, keyCol, tsCol, valCol, tieBreak)

  /** Spectral power at fixed calendar periods over day moves.
    * Oracle-checked as q_periodogram. */
  def periodogram(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String,
                  periods: Seq[Int] = Seq(7, 30)): DataFrame =
    queries.Breadth110.periodogram(df, keyCol, tsCol, valCol, tieBreak,
      periods)

  /** Turning-point randomness z per key. Oracle-checked as
    * q_turning_points. */
  def turningPoints(df: DataFrame, keyCol: String, tsCol: String,
                    valCol: String, tieBreak: String): DataFrame =
    queries.Breadth110.turningPoints(df, keyCol, tsCol, valCol, tieBreak)

  /** Per-supplier ship-delay consistency, top-k most erratic by CV².
    * Oracle-checked as q_vendor_consistency. */
  def vendorConsistency(supplier: DataFrame, orders: DataFrame,
                        lineitem: DataFrame, k: Int = 10): DataFrame =
    queries.Breadth111.vendorConsistency(supplier, orders, lineitem, k)

  /** Granger-lite: market-lag F beyond the own lag, per key.
    * Oracle-checked as q_granger_lite. */
  def grangerLite(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String): DataFrame =
    queries.Breadth111.grangerLite(df, keyCol, tsCol, valCol, tieBreak)

  /** Dollar-grain zero-move share + mean unchanged-run length per key.
    * Oracle-checked as q_price_stickiness. */
  def priceStickiness(df: DataFrame, keyCol: String, tsCol: String,
                      valCol: String, tieBreak: String): DataFrame =
    queries.Breadth111.priceStickiness(df, keyCol, tsCol, valCol, tieBreak)

  /** Bollinger-inside-Keltner squeeze flags (integer verdict).
    * Oracle-checked as q_ttm_squeeze. */
  def ttmSqueeze(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, tieBreak: String, n: Int = 20): DataFrame =
    queries.Breadth112.ttmSqueeze(df, keyCol, tsCol, valCol, tieBreak, n)

  /** JdK-style relative strength ratio vs the equal-weight market.
    * Oracle-checked as q_rs_ratio. */
  def rsRatio(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              tieBreak: String, n: Int = 10): DataFrame =
    queries.Breadth112.rsRatio(df, keyCol, tsCol, valCol, tieBreak, n)

  /** Volume-price trend (quantized proportional flows).
    * Oracle-checked as q_vpt. */
  def vpt(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String, qtyJsonField: String): DataFrame =
    queries.Breadth112.vpt(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)

  /** ES₀.₁ gain/loss tail means and the Rachev ratio per key.
    * Oracle-checked as q_rachev_ratio. */
  def rachevRatio(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String): DataFrame =
    queries.Breadth113.rachevRatio(df, keyCol, tsCol, valCol, tieBreak)

  /** Mean day move / ulcer index per key. Oracle-checked as
    * q_martin_ratio. */
  def martinRatio(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String): DataFrame =
    queries.Breadth113.martinRatio(df, keyCol, tsCol, valCol, tieBreak)

  /** Mean day move / mean of the 3 deepest drawdown episodes.
    * Oracle-checked as q_sterling_lite. */
  def sterlingLite(df: DataFrame, keyCol: String, tsCol: String,
                   valCol: String, tieBreak: String): DataFrame =
    queries.Breadth113.sterlingLite(df, keyCol, tsCol, valCol, tieBreak)

  /** Lines-per-order histogram with exact mean basket value.
    * Oracle-checked as q_basket_size_dist. */
  def basketSizeDist(lineitem: DataFrame): DataFrame =
    queries.Breadth114.basketSizeDist(lineitem)

  /** Per-part price spread over the rank-exact median, top 20.
    * Oracle-checked as q_price_dispersion. */
  def priceDispersion(lineitem: DataFrame, k: Int = 20): DataFrame =
    queries.Breadth114.priceDispersion(lineitem, k)

  /** Repurchase share per part over its distinct buyers, top 20.
    * Oracle-checked as q_repurchase_rate. */
  def repurchaseRate(orders: DataFrame, lineitem: DataFrame,
                     k: Int = 20): DataFrame =
    queries.Breadth114.repurchaseRate(orders, lineitem, k)

  /** Quantity share index per (part type, ship month). Oracle-checked
    * as q_type_seasonality. */
  def typeSeasonality(part: DataFrame, lineitem: DataFrame): DataFrame =
    queries.Breadth115.typeSeasonality(part, lineitem)

  /** Rank-exact p50/p90 of order totals per month. Oracle-checked as
    * q_spend_quantile_trend. */
  def spendQuantileTrend(orders: DataFrame): DataFrame =
    queries.Breadth115.spendQuantileTrend(orders)

  /** Volume / revenue response per exact discount level.
    * Oracle-checked as q_discount_effect. */
  def discountEffect(lineitem: DataFrame): DataFrame =
    queries.Breadth115.discountEffect(lineitem)

  /** Centroid-argmax purity, mean own cosine and margin per label.
    * Oracle-checked as q_label_purity. */
  def labelPurity(emb: DataFrame): DataFrame =
    queries.Breadth116.labelPurity(emb)

  /** Centroid-form simplified silhouette per label. Oracle-checked as
    * q_silhouette_lite. */
  def silhouetteLite(emb: DataFrame): DataFrame =
    queries.Breadth116.silhouetteLite(emb)

  def bm25(docs: DataFrame, textCol: String, k: Int = 20): DataFrame =
    queries.Breadth102.bm25(docs, textCol, k)

  /** Per-dimension mean/σ of the embedding corpus (quantized-exact).
    * Oracle-checked as q_dim_stats. */
  def dimStats(emb: DataFrame): DataFrame =
    queries.Breadth102.dimStats(emb)

  /** Cosine-to-centroid spread of the embedding corpus.
    * Oracle-checked as q_isotropy. */
  def isotropy(emb: DataFrame): DataFrame =
    queries.Breadth102.isotropy(emb)

  /** One-way ANOVA F + η² of a numeric column across groups.
    * Oracle-checked as q_anova_f. */
  def anovaF(df: DataFrame, grpCol: String, xCol: String): DataFrame =
    queries.Breadth82.anovaF(df, grpCol, xCol)

  /** Cramér's V of a categorical column × calendar month.
    * Oracle-checked as q_cramers_v. */
  def cramersV(df: DataFrame, typeCol: String, tsCol: String): DataFrame =
    queries.Breadth82.cramersV(df, typeCol, tsCol)

  /** Tie-corrected Kruskal-Wallis H across groups (value-domain-bounded
    * ranks, no global per-row sort). Oracle-checked as q_kruskal. */
  def kruskal(df: DataFrame, grpCol: String, xCol: String): DataFrame =
    queries.Breadth82.kruskal(df, grpCol, xCol)

  /** Merged-interval union coverage of per-supplier ship windows.
    * Oracle-checked as q_ship_coverage. */
  def shipCoverage(lineitem: DataFrame): DataFrame =
    queries.Breadth83.shipCoverage(lineitem)

  /** Idle-gap anatomy between merged ship islands per supplier.
    * Oracle-checked as q_ship_gaps. */
  def shipGaps(lineitem: DataFrame): DataFrame =
    queries.Breadth83.shipGaps(lineitem)

  /** Peak simultaneous open orders per customer nation (sweep line over
    * day-grain deltas). Oracle-checked as q_order_concurrency. */
  def orderConcurrency(nation: DataFrame, customer: DataFrame,
                       orders: DataFrame): DataFrame =
    queries.Breadth83.orderConcurrency(nation, customer, orders)

  /** Integer-exact stationary distribution of the pooled per-key state
    * chain (20 fixed-point power iterations).
    * Oracle-checked as q_markov_stationary. */
  def markovStationary(df: DataFrame, keyCol: String, stateCol: String,
                       tsCol: String, tieBreak: String): DataFrame =
    queries.Breadth84.markovStationary(df, keyCol, stateCol, tsCol, tieBreak)

  /** Supplier-side projection of the supplier–part bipartite graph.
    * Oracle-checked as q_bipartite_proj. */
  def bipartiteProj(lineitem: DataFrame, minShared: Int = 2,
                    topN: Int = 20): DataFrame =
    queries.Breadth84.bipartiteProj(lineitem, minShared, topN)

  /** Degree histogram of both sides of the supplier–part graph.
    * Oracle-checked as q_degree_hist. */
  def degreeHist(lineitem: DataFrame): DataFrame =
    queries.Breadth84.degreeHist(lineitem)

  /** Lo–MacKinlay variance ratio VR(q) per key from exact integer sums.
    * Oracle-checked as q_variance_ratio. */
  def varianceRatio(df: DataFrame, keyCol: String, tsCol: String,
                    valCol: String, tieBreak: String, q: Int = 5): DataFrame =
    queries.Breadth85.varianceRatio(df, keyCol, tsCol, valCol, tieBreak, q)

  /** Cornish–Fisher modified 95% VaR per key from decimal power sums.
    * Oracle-checked as q_cf_var. */
  def cfVar(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
            tieBreak: String): DataFrame =
    queries.Breadth85.cfVar(df, keyCol, tsCol, valCol, tieBreak)

  /** Rank-exact p95 + max daily drawdown depth per key.
    * Oracle-checked as q_dar. */
  def drawdownAtRisk(df: DataFrame, keyCol: String, tsCol: String,
                     valCol: String, tieBreak: String): DataFrame =
    queries.Breadth85.drawdownAtRisk(df, keyCol, tsCol, valCol, tieBreak)

  /** Top customers by returned-line revenue (the TPC-H Q10 skeleton).
    * Oracle-checked as q_returned_revenue. */
  def returnedRevenue(nation: DataFrame, customer: DataFrame,
                      orders: DataFrame, lineitem: DataFrame,
                      k: Int = 20): DataFrame =
    queries.Breadth86.returnedRevenue(nation, customer, orders, lineitem, k)

  /** PROMO revenue share per ship month (the TPC-H Q14 skeleton).
    * Oracle-checked as q_promo_share. */
  def promoShare(part: DataFrame, lineitem: DataFrame): DataFrame =
    queries.Breadth86.promoShare(part, lineitem)

  /** Large-volume orders joined back to their customer (the TPC-H Q18
    * skeleton). Oracle-checked as q_big_orders. */
  def bigOrders(customer: DataFrame, orders: DataFrame,
                lineitem: DataFrame, minQty: Long = 200L,
                k: Int = 25): DataFrame =
    queries.Breadth86.bigOrders(customer, orders, lineitem, minQty, k)

  /** RAKE keyword extraction: top phrases by deg/freq word scores.
    * Oracle-checked as q_rake_keywords. */
  def rakeKeywords(docs: DataFrame, idCol: String, textCol: String,
                   topN: Int = 15): DataFrame =
    queries.Breadth87.rakeKeywords(docs, idCol, textCol, topN)

  /** Top-k character trigrams per language label (the classic lang-ID
    * profile table). Oracle-checked as q_lang_trigrams. */
  def langTrigrams(docs: DataFrame, langCol: String, textCol: String,
                   k: Int = 5): DataFrame =
    queries.Breadth87.langTrigrams(docs, langCol, textCol, k)

  /** Gini concentration of the token-frequency distribution per source.
    * Oracle-checked as q_token_gini. */
  def tokenGini(docs: DataFrame, srcCol: String, textCol: String): DataFrame =
    queries.Breadth87.tokenGini(docs, srcCol, textCol)

  /** Additive 7-day-trend / weekday-seasonal / residual decomposition
    * per key. Oracle-checked as q_stl_decomp. */
  def stlDecomp(df: DataFrame, keyCol: String, tsCol: String,
                valCol: String, tieBreak: String): DataFrame =
    queries.Breadth88.stlDecomp(df, keyCol, tsCol, valCol, tieBreak)

  /** Exact binary-segmentation changepoint per key.
    * Oracle-checked as q_changepoint. */
  def changepoint(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String): DataFrame =
    queries.Breadth88.changepoint(df, keyCol, tsCol, valCol, tieBreak)

  /** Closed-form 2×2 PCA per key on (day move, day volume).
    * Oracle-checked as q_pca2. */
  def pca2(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
           tieBreak: String, qtyJsonField: String): DataFrame =
    queries.Breadth88.pca2(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)

  /** DAU/MAU stickiness per day via the merged-interval sweep (no
    * distinct-over-window). Oracle-checked as q_stickiness. */
  def stickiness(df: DataFrame, keyCol: String, tsCol: String,
                 win: Int = 28): DataFrame =
    queries.Breadth89.stickiness(df, keyCol, tsCol, win)

  /** Power-user curve: users active on exactly k of the trailing
    * window days. Oracle-checked as q_l28_histogram. */
  def l28Histogram(df: DataFrame, keyCol: String, tsCol: String,
                   win: Int = 28): DataFrame =
    queries.Breadth89.l28Histogram(df, keyCol, tsCol, win)

  /** New vs returning user counts per day.
    * Oracle-checked as q_new_returning. */
  def newReturning(df: DataFrame, keyCol: String, tsCol: String): DataFrame =
    queries.Breadth89.newReturning(df, keyCol, tsCol)

  /** Open-order aging buckets at a snapshot date.
    * Oracle-checked as q_backlog_aging. */
  def backlogAging(orders: DataFrame, lineitem: DataFrame,
                   snapshot: String = "1998-01-01"): DataFrame =
    queries.Breadth90.backlogAging(orders, lineitem, snapshot)

  /** Weekly order fill rate (worst line lag within k days).
    * Oracle-checked as q_fill_rate. */
  def fillRate(orders: DataFrame, lineitem: DataFrame,
               fillDays: Int = 14): DataFrame =
    queries.Breadth90.fillRate(orders, lineitem, fillDays)

  /** ABC (revenue cumshare) × XYZ (demand CV) inventory matrix.
    * Oracle-checked as q_abc_xyz. */
  def abcXyz(lineitem: DataFrame): DataFrame =
    queries.Breadth90.abcXyz(lineitem)

  /** Exact per-label centroid component table (1e-6-quantized integer
    * sums). Oracle-checked as q_label_centroids. */
  def labelCentroids(emb: DataFrame): DataFrame =
    queries.Breadth91.labelCentroids(emb)

  /** Inter-label centroid cosine matrix from exact integer sums.
    * Oracle-checked as q_centroid_sim. */
  def centroidSim(emb: DataFrame): DataFrame =
    queries.Breadth91.centroidSim(emb)

  /** Per-label vector-norm histogram (0.1-wide buckets).
    * Oracle-checked as q_norm_hist. */
  def normHist(emb: DataFrame): DataFrame =
    queries.Breadth91.normHist(emb)

  /** Coppock curve (cent WMA(10) of ROC14+ROC11) per key.
    * Oracle-checked as q_coppock. */
  def coppock(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              tieBreak: String): DataFrame =
    queries.Breadth92.coppock(df, keyCol, tsCol, valCol, tieBreak)

  /** Know Sure Thing + signal line per key, exact integer numerators.
    * Oracle-checked as q_kst. */
  def kst(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String): DataFrame =
    queries.Breadth92.kst(df, keyCol, tsCol, valCol, tieBreak)

  /** Chandelier long/short exits over w bars (simple-mean ATR).
    * Oracle-checked as q_chandelier. */
  def chandelier(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, tieBreak: String, w: Int = 22): DataFrame =
    queries.Breadth92.chandelier(df, keyCol, tsCol, valCol, tieBreak, w)

  /** Top first-3-event-type journey paths.
    * Oracle-checked as q_user_paths. */
  def userPaths(df: DataFrame, keyCol: String, tsCol: String,
                tieBreak: String, typeCol: String,
                topN: Int = 20): DataFrame =
    queries.Breadth93.userPaths(df, keyCol, tsCol, tieBreak, typeCol, topN)

  /** Step-indexed transition counts over each user's opening events.
    * Oracle-checked as q_step_transitions. */
  def stepTransitions(df: DataFrame, keyCol: String, tsCol: String,
                      tieBreak: String, typeCol: String): DataFrame =
    queries.Breadth93.stepTransitions(df, keyCol, tsCol, tieBreak, typeCol)

  /** Rank-exact median/p90 of first-signup→first-purchase latency.
    * Oracle-checked as q_time_to_convert. */
  def timeToConvert(df: DataFrame, keyCol: String, tsCol: String,
                    tieBreak: String, typeCol: String, fromType: String,
                    toType: String): DataFrame =
    queries.Breadth93.timeToConvert(df, keyCol, tsCol, tieBreak, typeCol,
      fromType, toType)

  /** Mean move + up-share by turn-of-month bucket.
    * Oracle-checked as q_turn_of_month. */
  def turnOfMonth(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String): DataFrame =
    queries.Breadth94.turnOfMonth(df, keyCol, tsCol, valCol, tieBreak)

  /** Month-anchored running VWAP per key.
    * Oracle-checked as q_anchored_vwap. */
  def anchoredVwap(df: DataFrame, keyCol: String, tsCol: String,
                   valCol: String, tieBreak: String,
                   qtyJsonField: String): DataFrame =
    queries.Breadth94.anchoredVwap(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)

  /** Lognormal μ/σ fit of order totals per market segment.
    * Oracle-checked as q_price_lognorm. */
  def priceLognorm(customer: DataFrame, orders: DataFrame): DataFrame =
    queries.Breadth94.priceLognorm(customer, orders)

  /** Elder Ray per key: EMA-13 mid + bull/bear power from the bar
    * high/low. Oracle-checked as q_elder_ray. */
  def elderRay(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
               tieBreak: String): DataFrame =
    queries.Breadth28.elderRay(df, keyCol, tsCol, valCol, tieBreak)

  /** Streaming twin of [[elderRay]]. Spec-pinned. */
  def liveElderRay(bars: org.apache.spark.sql.Dataset[streaming.OhlcBarRow])
      : org.apache.spark.sql.Dataset[streaming.ElderScored] =
    streaming.Streams.streamingElderRay(bars)

  /** Wilder parabolic SAR per key: the regime-switching stop-and-
    * reverse recurrence. Oracle-checked as q_psar. */
  def psar(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
           tieBreak: String): DataFrame =
    queries.Breadth30.psar(df, keyCol, tsCol, valCol, tieBreak)

  /** Streaming twin of [[psar]] — the SAME step function. Spec-pinned. */
  def livePsar(bars: org.apache.spark.sql.Dataset[streaming.OhlcBarRow])
      : org.apache.spark.sql.Dataset[streaming.PsarScored] =
    streaming.Streams.streamingPsar(bars)

  /** Stochastic RSI per key: the Wilder RSI series normalized to its
    * rolling min/max range. Oracle-checked as q_stoch_rsi. */
  def stochRsi(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
               tieBreak: String): DataFrame =
    queries.Breadth30.stochRsi(df, keyCol, tsCol, valCol, tieBreak)

  /** Chande momentum oscillator per key (windowed up/down cent sums).
    * Oracle-checked as q_cmo. */
  def cmo(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String): DataFrame =
    queries.Breadth30.cmo(df, keyCol, tsCol, valCol, tieBreak)

  /** Unannualized daily Sortino per key (downside semi-deviation).
    * Oracle-checked as q_sortino. */
  def sortino(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              tieBreak: String): DataFrame =
    queries.Breadth30.sortino(df, keyCol, tsCol, valCol, tieBreak)

  /** N-day rate of change per key over day-bar closes. Oracle-checked
    * as q_roc. */
  def roc(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String): DataFrame =
    queries.Breadth30.roc(df, keyCol, tsCol, valCol, tieBreak)

  /** Floor-trader pivot points from the prior day's bar. Oracle-checked
    * as q_pivot_points. */
  def pivotPoints(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                  tieBreak: String): DataFrame =
    queries.Breadth30.pivotPoints(df, keyCol, tsCol, valCol, tieBreak)

  /** WMA(10) per key: the linearly-weighted MA with an integer lag-sum
    * numerator. Oracle-checked as q_wma. */
  def wma(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String): DataFrame =
    queries.Breadth31.wma(df, keyCol, tsCol, valCol, tieBreak)

  /** Streaming twin of [[wma]] — the window-family twin (O(w) close
    * ring per key), same integer numerator. Spec-pinned. */
  def liveWma(bars: org.apache.spark.sql.Dataset[streaming.BarRow])
      : org.apache.spark.sql.Dataset[streaming.WmaScored] =
    streaming.Streams.streamingWma(bars)

  /** Hull MA(8): WMA(3) over 2·WMA(4) − WMA(8). Oracle-checked as
    * q_hma. */
  def hma(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String): DataFrame =
    queries.Breadth31.hma(df, keyCol, tsCol, valCol, tieBreak)

  /** Omega ratio at threshold 0 + win rate per key. Oracle-checked as
    * q_omega. */
  def omega(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
            tieBreak: String): DataFrame =
    queries.Breadth31.omega(df, keyCol, tsCol, valCol, tieBreak)

  /** Calmar-style net-move-over-max-drawdown recovery ratio per key.
    * Oracle-checked as q_calmar. */
  def calmar(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
             tieBreak: String): DataFrame =
    queries.Breadth31.calmar(df, keyCol, tsCol, valCol, tieBreak)

  /** Drawdown duration per key: longest underwater spell on the bar
    * grid (gaps-and-islands). Oracle-checked as q_dd_duration. */
  def ddDuration(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                 tieBreak: String): DataFrame =
    queries.Breadth31.ddDuration(df, keyCol, tsCol, valCol, tieBreak)

  /** Interpolated bigram LM corpus-likelihood scoring per document.
    * Oracle-checked as q_bigram_lm. */
  def bigramLm(spark: SparkSession, dir: String): DataFrame =
    queries.Breadth31.bigramLm(spark, dir)

  /** Dreiss choppiness index per key (14-bar true-range window).
    * Oracle-checked as q_choppiness. */
  def choppiness(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                 tieBreak: String): DataFrame =
    queries.Breadth32.choppiness(df, keyCol, tsCol, valCol, tieBreak)

  /** Ehlers Fisher transform per key (10-bar range-normalization
    * recurrence with the ±0.999 clamp). Oracle-checked as q_fisher. */
  def fisher(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
             tieBreak: String): DataFrame =
    queries.Breadth32.fisher(df, keyCol, tsCol, valCol, tieBreak)

  /** Perplexity keep/drop gate at the corpus 90th percentile over the
    * unigram-LM scoring. Oracle-checked as q_ppl_gate. */
  def pplGate(spark: SparkSession, dir: String): DataFrame =
    queries.Breadth32.pplGate(spark, dir)

  /** Relative vigor index per key: Σ(C−O)/Σ(H−L) over 10 bars + the
    * 4-bar symmetric signal. Oracle-checked as q_rvi. */
  def rvi(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String): DataFrame =
    queries.Breadth33.rvi(df, keyCol, tsCol, valCol, tieBreak)

  /** Williams Ultimate Oscillator per key (4/8/16-bar buying-pressure
    * ratios). Oracle-checked as q_ultimate_osc. */
  def ultimateOsc(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                  tieBreak: String): DataFrame =
    queries.Breadth33.ultimateOsc(df, keyCol, tsCol, valCol, tieBreak)

  /** Vertical horizontal filter per key (range over path length).
    * Oracle-checked as q_vhf. */
  def vhf(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String): DataFrame =
    queries.Breadth33.vhf(df, keyCol, tsCol, valCol, tieBreak)

  /** Signed up/down streak length per key (integer recurrence).
    * Oracle-checked as q_streak. */
  def streak(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
             tieBreak: String): DataFrame =
    queries.Breadth33.streak(df, keyCol, tsCol, valCol, tieBreak)

  /** Connors RSI per key: (RSI3(close) + RSI2(streak) + PctRank₁₀₀)/3 —
    * three recurrences + a 100-return ring in ONE fold. Oracle-checked
    * as q_connors_rsi. */
  def connorsRsi(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                 tieBreak: String): DataFrame =
    queries.Breadth34.connorsRsi(df, keyCol, tsCol, valCol, tieBreak)

  /** Tokenizer fertility per doc (BPE-ish subwords per whitespace
    * word). Oracle-checked as q_fertility. */
  def fertility(docs: DataFrame): DataFrame =
    queries.Breadth34.fertility(docs)

  /** Elder impulse per key: green/red/blue from the joint EMA-13 /
    * MACD-histogram direction. Oracle-checked as q_elder_impulse. */
  def elderImpulse(df: DataFrame, keyCol: String, tsCol: String,
                   valCol: String, tieBreak: String): DataFrame =
    queries.Breadth35.elderImpulse(df, keyCol, tsCol, valCol, tieBreak)

  /** ZigZag 5% swing pivots per key (integer-only recurrence).
    * Oracle-checked as q_zigzag. */
  def zigzag(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
             tieBreak: String): DataFrame =
    queries.Breadth36.zigzag(df, keyCol, tsCol, valCol, tieBreak)

  /** Rolling 20-bar one-factor beta per key. Oracle-checked as
    * q_rolling_beta. */
  def rollingBeta(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                  tieBreak: String): DataFrame =
    queries.Breadth36.rollingBeta(df, keyCol, tsCol, valCol, tieBreak)

  /** ATR(5)/ATR(20) volatility regime ratio per key. Oracle-checked as
    * q_vol_ratio. */
  def volRatio(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
               tieBreak: String): DataFrame =
    queries.Breadth37.volRatio(df, keyCol, tsCol, valCol, tieBreak)

  /** Overnight gap decomposition per key. Oracle-checked as
    * q_gap_stats. */
  def gapStats(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
               tieBreak: String): DataFrame =
    queries.Breadth37.gapStats(df, keyCol, tsCol, valCol, tieBreak)

  /** Ease of Movement EMV(14) per key — the windowed integer
    * aggregate-ratio form. Oracle-checked as q_emv. */
  def emv(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieBreak: String, qtyJsonField: String): DataFrame =
    queries.Breadth38.emv(df, keyCol, tsCol, valCol, tieBreak, qtyJsonField)

  /** Heaps-law vocabulary growth over corpus deciles. Oracle-checked
    * as q_vocab_growth. */
  def vocabGrowth(docs: DataFrame): DataFrame =
    queries.Breadth38.vocabGrowth(docs)

  /** Market-breadth A/D line + McClellan oscillator (per-day,
    * cross-sectional). Oracle-checked as q_ad_line. */
  def adLine(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
             tieBreak: String): DataFrame =
    queries.Breadth39.adLine(df, keyCol, tsCol, valCol, tieBreak)

  /** New 20-bar highs/lows per day (breadth thrust). Oracle-checked as
    * q_new_extremes. */
  def newExtremes(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String): DataFrame =
    queries.Breadth39.newExtremes(df, keyCol, tsCol, valCol, tieBreak)

  /** Share of keys above their own 20-bar mean, per day (integer
    * cross-multiplication test). Oracle-checked as q_pct_above_ma. */
  def pctAboveMa(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                 tieBreak: String): DataFrame =
    queries.Breadth40.pctAboveMa(df, keyCol, tsCol, valCol, tieBreak)

  /** Cross-sectional dispersion of same-day moves. Oracle-checked as
    * q_dispersion. */
  def dispersion(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                 tieBreak: String): DataFrame =
    queries.Breadth40.dispersion(df, keyCol, tsCol, valCol, tieBreak)

  /** Wald–Wolfowitz runs test on up/down day signs per key.
    * Oracle-checked as q_runs_test. */
  def runsTest(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
               tieBreak: String): DataFrame =
    queries.Breadth41.runsTest(df, keyCol, tsCol, valCol, tieBreak)

  /** Cross-sectional trailing-return momentum ranks + deciles per day.
    * Oracle-checked as q_mom_rank. */
  def momRank(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              tieBreak: String): DataFrame =
    queries.Breadth41.momRank(df, keyCol, tsCol, valCol, tieBreak)

  /** Lead–lag cross-correlation panel over the top-key pairs (lags
    * −2..2, best-lag flagged). Oracle-checked as q_lead_lag. */
  def leadLag(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              tieBreak: String): DataFrame =
    queries.Breadth42.leadLag(df, keyCol, tsCol, valCol, tieBreak)

  /** Undirected within-label kNN edge set over an embeddings frame
    * (vec_id, embedding, label). Oracle-checked via q_knn_triangles /
    * q_link_predict / q_graph_components. */
  def knnEdges(emb: DataFrame, k: Int = 4): DataFrame =
    queries.Breadth43.knnEdges(emb, k)

  /** Per-node triangle count + local clustering coefficient over a
    * canonical (id_a < id_b) edge frame. Oracle-checked as
    * q_knn_triangles. */
  def triangleStats(edges: DataFrame): DataFrame =
    queries.Breadth43.triangleStats(edges)

  /** Common-neighbour / Jaccard / Adamic–Adar link prediction over a
    * canonical edge frame. Oracle-checked as q_link_predict. */
  def linkPredict(edges: DataFrame): DataFrame =
    queries.Breadth43.linkPredict(edges)

  /** Count–min sketch point estimates for the hottest keys (d=4, w=64,
    * Carter–Wegman mod-P hashes). Oracle-checked as q_count_min. */
  def countMin(df: DataFrame, keyCol: String): DataFrame =
    queries.Breadth44.countMin(df, keyCol)

  /** Holt double-exponential level/trend/forecast series per key.
    * Oracle-checked as q_holt; [[liveHolt]] is its streaming twin. */
  def holt(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
           tieBreak: String): DataFrame =
    queries.Breadth45.holtSeries(df, keyCol, tsCol, valCol, tieBreak)

  /** Streaming twin of [[holt]] — the SAME step function on O(1) keyed
    * state. Spec-pinned bit-equal to the batch fold. */
  def liveHolt(bars: org.apache.spark.sql.Dataset[streaming.BarRow])
      : org.apache.spark.sql.Dataset[streaming.HoltScored] =
    streaming.Streams.streamingHolt(bars)

  /** Theil–Sen robust slope per key (low-median pairwise slope).
    * Oracle-checked as q_theil_sen. */
  def theilSen(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
               tieBreak: String): DataFrame =
    queries.Breadth45.theilSen(df, keyCol, tsCol, valCol, tieBreak)

  /** Out-of-sample VaR backtest (60/40 time split, Kupiec LR).
    * Oracle-checked as q_var_backtest. */
  def varBacktest(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String): DataFrame =
    queries.Breadth47.varBacktest(df, keyCol, tsCol, valCol, tieBreak)

  /** Rolling-volatility cone (rank-picked quartiles per horizon).
    * Oracle-checked as q_vol_cone. */
  def volCone(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              tieBreak: String): DataFrame =
    queries.Breadth47.volCone(df, keyCol, tsCol, valCol, tieBreak)

  /** Per-document first-occurrence novelty over shingle sets.
    * Oracle-checked as q_novelty. */
  def novelty(docs: DataFrame): DataFrame =
    queries.Breadth48.novelty(docs)

  /** Per-source shingle redundancy (dedup-potential ranking).
    * Oracle-checked as q_source_redundancy. */
  def sourceRedundancy(docs: DataFrame): DataFrame =
    queries.Breadth48.sourceRedundancy(docs)

  /** Block-mean perceptual hash of binary media payloads.
    * Oracle-checked as q_media_phash / q_phash_neardup. */
  def mediaBlockHash(media: org.apache.spark.sql.Dataset[
      multimodal.Multimodal.MediaRow], blocks: Int = 16): DataFrame =
    multimodal.Multimodal.blockHash(media, blocks)

  /** SAX symbolization: rank-quartile PAA segments per key.
    * Oracle-checked as q_sax / q_sax_words. */
  def saxSegments(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String): DataFrame =
    queries.Breadth51.saxSegments(df, keyCol, tsCol, valCol, tieBreak)

  /** Three-bar candlestick sequence flags (soldiers / crows / morning
    * star). Oracle-checked as q_three_bar_patterns. */
  def threeBarPatterns(df: DataFrame, keyCol: String, tsCol: String,
                       valCol: String, tieBreak: String): DataFrame =
    queries.Breadth52.threeBarPatterns(df, keyCol, tsCol, valCol, tieBreak)

  /** Balance of Power per bar + 5-bar integer-sum form. Oracle-checked
    * as q_bop. */
  def balanceOfPower(df: DataFrame, keyCol: String, tsCol: String,
                     valCol: String, tieBreak: String): DataFrame =
    queries.Breadth52.bop(df, keyCol, tsCol, valCol, tieBreak)

  /** Composite quality-rules gate per document. Oracle-checked as
    * q_gopher_rules / q_rule_attrition. */
  def qualityRules(docs: DataFrame): DataFrame =
    queries.Breadth53.ruleTable(docs)

  /** Volume-at-price profile with point of control. Oracle-checked as
    * q_volume_profile. */
  def volumeProfile(df: DataFrame, keyCol: String, tsCol: String,
                    valCol: String, tieBreak: String,
                    qtyJsonField: String): DataFrame =
    queries.Breadth54.volumeProfile(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)

  /** OBV divergence flags. Oracle-checked as q_obv_divergence. */
  def obvDivergence(df: DataFrame, keyCol: String, tsCol: String,
                    valCol: String, tieBreak: String,
                    qtyJsonField: String): DataFrame =
    queries.Breadth54.obvDivergence(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)

  /** Equal-weight index NAV + cross-multiplied index return.
    * Oracle-checked as q_index_nav. */
  def indexNav(df: DataFrame, keyCol: String, tsCol: String,
               valCol: String, tieBreak: String): DataFrame =
    queries.Breadth55.indexNav(df, keyCol, tsCol, valCol, tieBreak)

  /** Exact value-weight turnover between consecutive days.
    * Oracle-checked as q_turnover. */
  def turnover(df: DataFrame, keyCol: String, tsCol: String,
               valCol: String, tieBreak: String): DataFrame =
    queries.Breadth55.turnover(df, keyCol, tsCol, valCol, tieBreak)

  /** Information-driven volume bars. Oracle-checked as q_volume_bars;
    * [[liveVpinBuckets]] streams the same buckets. */
  def volumeBars(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, tieBreak: String,
                 qtyJsonField: String): DataFrame =
    queries.Breadth56.volumeBars(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)

  /** VPIN order-flow imbalance over volume bars. Oracle-checked as
    * q_vpin. */
  def vpin(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
           tieBreak: String, qtyJsonField: String): DataFrame =
    queries.Breadth56.vpin(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)

  /** Dollar (value) bars. Oracle-checked as q_dollar_bars. */
  def dollarBars(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, tieBreak: String,
                 qtyJsonField: String): DataFrame =
    queries.Breadth58.dollarBars(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)

  /** Lang-ID confusion matrix / per-language precision-recall.
    * Oracle-checked as q_lang_confusion / q_lang_prf. */
  def langConfusion(docs: DataFrame): DataFrame =
    queries.Breadth57.langConfusion(docs)
  def langPrf(docs: DataFrame): DataFrame =
    queries.Breadth57.langPrf(docs)

  /** Streaming VPIN volume buckets — completed buckets only, bit-equal
    * to the batch construction. Spec-pinned. */
  def liveVpinBuckets(ticks: org.apache.spark.sql.Dataset[streaming.TickRow],
                      barVol: Long = queries.Breadth56.BarVol)
      : org.apache.spark.sql.Dataset[streaming.VpinBucket] =
    streaming.Streams.streamingVpinBuckets(ticks, barVol)

  /** Streaming three-bar pattern screen — the SAME flag semantics as
    * the batch q_three_bar_patterns, parity-pinned across batch
    * splits. */
  def liveThreeBar(bars: org.apache.spark.sql.Dataset[streaming.OcBarRow])
      : org.apache.spark.sql.Dataset[streaming.ThreeBarScored] =
    streaming.Streams.streamingThreeBar(bars)

  /** Streaming count–min cells: the live sketch over a key stream —
    * d·w keyed counters total. Spec-pinned equal to the batch sketch. */
  def liveCmsCells(keys: org.apache.spark.sql.Dataset[Long], w: Int = 64)
      : org.apache.spark.sql.Dataset[streaming.CmsCellState] =
    streaming.Streams.streamingCmsCells(keys, w)

  /** Streaming twin of [[elderImpulse]] — the SAME step function.
    * Spec-pinned. */
  def liveElderImpulse(bars: org.apache.spark.sql.Dataset[streaming.BarRow])
      : org.apache.spark.sql.Dataset[streaming.ImpulseScored] =
    streaming.Streams.streamingElderImpulse(bars)

  /** Near-dup threshold sensitivity curve over the shared verified-pair
    * chain. Oracle-checked as q_dedup_sensitivity. */
  def dedupSensitivity(spark: SparkSession, dir: String): DataFrame =
    queries.Breadth35.dedupSensitivity(spark, dir)

  /** k-means cluster balance report (size + corpus share).
    * Oracle-checked as q_cluster_mixture. */
  def clusterMixture(spark: SparkSession, dir: String): DataFrame =
    queries.Breadth35.clusterMixture(spark, dir)

  /** Streaming twin of [[streak]] — the SAME step function.
    * Spec-pinned. */
  def liveStreak(bars: org.apache.spark.sql.Dataset[streaming.BarRow])
      : org.apache.spark.sql.Dataset[streaming.StreakScored] =
    streaming.Streams.streamingStreak(bars)

  /** Streaming twin of [[connorsRsi]] — the SAME composite step (three
    * recurrences + the 100-return ring) on O(100) keyed state.
    * Spec-pinned. */
  def liveConnorsRsi(bars: org.apache.spark.sql.Dataset[streaming.BarRow])
      : org.apache.spark.sql.Dataset[streaming.CrsiScored] =
    streaming.Streams.streamingConnorsRsi(bars)

  /** Streaming twin of [[nviPvi]] — the SAME step function as the
    * batch fold. Spec-pinned. */
  def liveNviPvi(bars: org.apache.spark.sql.Dataset[streaming.VolBarRow])
      : org.apache.spark.sql.Dataset[streaming.NviScored] =
    streaming.Streams.streamingNviPvi(bars)

  /** Streaming twin of [[trix]]. Spec-pinned. */
  def liveTrix(bars: org.apache.spark.sql.Dataset[streaming.BarRow])
      : org.apache.spark.sql.Dataset[streaming.TrixScored28] =
    streaming.Streams.streamingTrix(bars)

  /** Streaming twin of [[kama]]. Spec-pinned. */
  def liveKama(bars: org.apache.spark.sql.Dataset[streaming.BarRow])
      : org.apache.spark.sql.Dataset[streaming.KamaScored] =
    streaming.Streams.streamingKama(bars)

  /** Parkinson range volatility per key (quantized log-range terms). */
  def parkinson(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                tieBreak: String, qtyJsonField: String = "k"): DataFrame =
    queries.Breadth29.parkinson(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)

  /** Garman–Klass range+body volatility per key. */
  def garmanKlass(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String,
                  qtyJsonField: String = "k"): DataFrame =
    queries.Breadth29.garmanKlass(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)

  /** Kyle-style price-impact OLS slope per key (|Δclose| on volume). */
  def kyleLambda(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, tieBreak: String,
                 qtyJsonField: String = "k"): DataFrame =
    queries.Breadth29.kyleLambda(df, keyCol, tsCol, valCol, tieBreak,
      qtyJsonField)

  /** Herfindahl–Hirschman volume concentration across keys (one row). */
  def herfindahl(df: DataFrame, keyCol: String, tsCol: String,
                 qtyJsonField: String = "k"): DataFrame =
    queries.Breadth29.herfindahl(df, keyCol, tsCol, qtyJsonField)

  /** Signed feature hashing of token streams into a fixed bucket
    * space — sparse (doc, bucket, weight) rows, no vocabulary build. */
  def featureHash(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id",
                  buckets: Long = queries.Extensions11.FeatBuckets): DataFrame =
    queries.Extensions11.featureHash(docs, textCol, idCol, buckets)

  // ---- live quote pipeline (the reference ETL, end to end) ------------

  /** One poll of the upstream quote API staged into the tick log the
    * `graft-ticks` source streams from — the fetch seam a deployment
    * points at the real REST endpoint. See sources.Sources. */
  def stageTick(spark: SparkSession, fetch: () => String, stagingDir: String,
                tickTime: java.sql.Timestamp): Long =
    sources.Sources.stageTickPayload(spark, fetch, stagingDir, tickTime)

  /** The staged tick log as a streaming frame (`format("graft-ticks")`:
    * offsets are tick ids, restart resumes from the committed tick). */
  def tickStream(spark: SparkSession, stagingDir: String): DataFrame =
    spark.readStream.format("graft-ticks").load(stagingDir)

  /** The staged tick log as a batch frame (the backfill read). */
  def tickBacklog(spark: SparkSession, stagingDir: String): DataFrame =
    spark.read.format("graft-ticks").load(stagingDir)

  /** The reference's whole ETL tick as one resident streaming query:
    * tick log → shape → history store → latest-per-symbol snapshot →
    * `onSnapshot` push (fan out via streaming.SnapshotFanout). See
    * streaming.Streams.startQuoteStream. */
  def startQuoteStream(spark: SparkSession, stagingDir: String,
                       storePath: String, checkpoint: String,
                       snapshotPath: String,
                       trigger: org.apache.spark.sql.streaming.Trigger =
                         org.apache.spark.sql.streaming.Trigger.ProcessingTime("5 minutes"))
                      (onSnapshot: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    streaming.Streams.startQuoteStream(spark, stagingDir, storePath,
      checkpoint, snapshotPath, trigger)(onSnapshot)

  // ---- crawl cleaning (column expressions, re-exported) ---------------

  /** Remove every '<...>' tag run — see text.Web.stripTags. */
  def stripTags(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    text.Web.stripTags(c)

  /** Canonical page identity (lower host, no www/query/fragment) — see
    * text.Web.canonicalUrl. */
  def canonicalUrl(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    text.Web.canonicalUrl(c)

  // ---- round-10 operators (waves 123-136), re-exported ----------------

  /** Integer HITS hubs/authorities over a directed (src, dst) edge
    * frame — see queries.Breadth117.hits. */
  def hits(edges: DataFrame): DataFrame = queries.Breadth117.hits(edges)

  /** Multi-source BFS hop histogram over an undirected (id_a, id_b)
    * edge frame with (node, label) seeds per label. */
  def hopHistogram(edges: DataFrame, labels: DataFrame): DataFrame =
    queries.Breadth117.hopHistogram(edges, labels)

  /** 1-D local-level Kalman filter per key over daily close bars. */
  def kalman(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
             tieBreak: String): DataFrame =
    queries.Breadth118.kalman(df, keyCol, tsCol, valCol, tieBreak)

  /** DTW distance from each key's close series to the per-day median
    * market series (all-integer DP). */
  def dtwMarket(df: DataFrame, keyCol: String, tsCol: String,
                valCol: String, tieBreak: String): DataFrame =
    queries.Breadth118.dtwMarket(df, keyCol, tsCol, valCol, tieBreak)

  /** Sign-flip permutation test of mean day move = 0, exact rational
    * p-values. */
  def permTest(df: DataFrame, keyCol: String, tsCol: String,
               valCol: String, tieBreak: String): DataFrame =
    queries.Breadth119.permTest(df, keyCol, tsCol, valCol, tieBreak)

  /** Benjamini–Hochberg step-up over the permutation p-values. */
  def bhFdr(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
            tieBreak: String): DataFrame =
    queries.Breadth119.bhFdr(df, keyCol, tsCol, valCol, tieBreak)

  /** 48 h view→click→purchase funnel level histogram (greedy merge). */
  def windowFunnel(df: DataFrame, keyCol: String = "user_id",
                   typeCol: String = "event_type",
                   tsCol: String = "ts"): DataFrame =
    queries.Breadth120.windowFunnel(df, keyCol, typeCol, tsCol)

  /** Ordered event-type sequence regex verdict per key. */
  def sequenceMatch(df: DataFrame, keyCol: String = "user_id",
                    typeCol: String = "event_type", tsCol: String = "ts",
                    tieBreak: String = "event_id",
                    pattern: String = "s[^e]*p"): DataFrame =
    queries.Breadth120.sequenceMatch(df, keyCol, typeCol, tsCol, tieBreak,
      pattern)

  /** Product-quantization ADC top-k for the probe vectors. */
  def pqAdc(embeddings: DataFrame, k: Int = 5): DataFrame =
    queries.Breadth121.pqAdc(embeddings, k)

  /** JL sign-projection cosine-distortion report over the kNN pairs. */
  def rpDistortion(spark: SparkSession, dir: String): DataFrame =
    queries.Breadth122.rpDistortion(spark, dir)

  /** Cluster-aware vs naive split near-dup leakage report. */
  def leakageSplit(spark: SparkSession, dir: String): DataFrame =
    queries.Breadth122.leakageSplit(spark, dir)

  /** Per-document duplicate-5-gram corpus coverage. */
  def dupNgramCoverage(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    queries.Breadth123.dupNgramCoverage(docs, idCol, textCol)

  /** Zero-clamped running balance of day moves per key. */
  def clampedBalance(df: DataFrame, keyCol: String, tsCol: String,
                     valCol: String, tieBreak: String): DataFrame =
    queries.Breadth123.clampedBalance(df, keyCol, tsCol, valCol, tieBreak)

  /** Bitemporal value-as-of over the 3×3 (tx, valid) probe grid. */
  def bitemporal(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, tieBreak: String): DataFrame =
    queries.Breadth124.bitemporal(df, keyCol, tsCol, valCol, tieBreak)

  /** Reciprocal-rank fusion of the exact and PQ retrieval rankings. */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame =
    queries.Breadth125.rrfFusion(spark, dir)

  /** MMR diversity re-ranking of each probe's top-10 candidates. */
  def mmrDiversify(embeddings: DataFrame): DataFrame =
    queries.Breadth126.mmrDiversify(embeddings)

  /** Content-defined chunking + dedup stats over (media_id, kind,
    * bytes) blobs. */
  def cdcChunks(media: DataFrame): DataFrame =
    queries.Breadth127.cdcChunks(media)

  /** Per-language over-represented tokens by exact integer lift. */
  def distinctiveTokens(docs: DataFrame): DataFrame =
    queries.Breadth128.distinctiveTokens(docs)

  /** Pairwise language vocabulary Jaccard. */
  def vocabOverlap(docs: DataFrame): DataFrame =
    queries.Breadth128.vocabOverlap(docs)

  /** Live Kalman screen — see streaming.Streams.streamingKalman. */
  def liveKalman(bars: org.apache.spark.sql.Dataset[streaming.BarRow])
      : org.apache.spark.sql.Dataset[streaming.KalmanScored] =
    streaming.Streams.streamingKalman(bars)

  /** Live clamped-balance screen. */
  def liveClampedBalance(bars: org.apache.spark.sql.Dataset[streaming.BarRow])
      : org.apache.spark.sql.Dataset[streaming.ClampScored] =
    streaming.Streams.streamingClampedBalance(bars)

  /** Live sequence-match DFA. */
  def liveSequenceMatch(ev: org.apache.spark.sql.Dataset[streaming.SeqEvent])
      : org.apache.spark.sql.Dataset[streaming.SeqMatchScored] =
    streaming.Streams.streamingSequenceMatch(ev)

  /** Live window funnel on bounded anchor-frontier state. */
  def liveWindowFunnel(ev: org.apache.spark.sql.Dataset[streaming.SeqEvent])
      : org.apache.spark.sql.Dataset[streaming.FunnelScored] =
    streaming.Streams.streamingWindowFunnel(ev)

  /** Forecast-baseline MAEs + MASE ratios per key. */
  def forecastEval(df: DataFrame, keyCol: String, tsCol: String,
                   valCol: String, tieBreak: String): DataFrame =
    queries.Breadth129.forecastEval(df, keyCol, tsCol, valCol, tieBreak)

  /** 7×24 ISO-weekday × hour activity grid. */
  def hourDowGrid(df: DataFrame, tsCol: String = "ts"): DataFrame =
    queries.Breadth129.hourDowGrid(df, tsCol)

  /** Page–Hinkley drift statistic + absorbing alarm per key. */
  def pageHinkley(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, tieBreak: String): DataFrame =
    queries.Breadth130.pageHinkley(df, keyCol, tsCol, valCol, tieBreak)

  /** Leave-one-out kNN label accuracy per label. */
  def knnEval(embeddings: DataFrame): DataFrame =
    queries.Breadth131.knnEval(embeddings)

  /** Two-sample Anderson–Darling between two groups of a column. */
  def andersonDarling(df: DataFrame, grpCol: String, valCol: String,
                      a: String, b: String): DataFrame =
    queries.Breadth132.andersonDarling(df, grpCol, valCol, a, b)

  /** Split × language stratification balance of the leakage-safe
    * split. */
  def splitBalance(spark: SparkSession, dir: String): DataFrame =
    queries.Breadth133.splitBalance(spark, dir)

  /** Live Page–Hinkley drift screen. */
  def livePageHinkley(bars: org.apache.spark.sql.Dataset[streaming.BarRow])
      : org.apache.spark.sql.Dataset[streaming.PhScored] =
    streaming.Streams.streamingPageHinkley(bars)

  /** CUPED variance reduction over pre/post user halves. */
  def cuped(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
            tieBreak: String): DataFrame =
    queries.Breadth134.cuped(df, keyCol, tsCol, valCol, tieBreak)

  /** Live mass-index screen (O(w) ratio ring; full windows only —
    * exactly the batch q_mass_index rows). */
  def liveMassIndex(bars: org.apache.spark.sql.Dataset[streaming.OhlcBarRow])
      : org.apache.spark.sql.Dataset[streaming.MassScored] =
    streaming.Streams.streamingMassIndex(bars)

  /** SimHash near-dup pairs at the corpus-sized combination-banding
    * operating point (hamming ≤ maxHamming; block count from one count
    * job — see Dedup.simhashOperatingPoint). */
  def simhashNearDups(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", blockCol: String = "source",
                      maxHamming: Int = 3): DataFrame =
    dedup.Dedup.simhashNearDupsAdaptive(docs, idCol, textCol, blockCol,
      maxHamming)

  /** Greedy k-center (Gonzalez max-min) coreset over the embeddings. */
  def kcenter(embeddings: DataFrame, k: Int = 8): DataFrame =
    queries.Breadth136.kcenter(embeddings, k)

  /** Round-robin curriculum order over (source, length rank). */
  def curriculum(docs: DataFrame, n: Int = 30): DataFrame =
    queries.Breadth136.curriculum(docs, n)

  /** Dominant right-singular direction of the quantized embedding
    * matrix (distributed power iteration). */
  def powerIteration(embeddings: DataFrame, iters: Int = 8): DataFrame =
    queries.Breadth137.powerIteration(embeddings, iters)

  /** Exact tie-handled ROC-AUC of `score` against boolean `pos`, one
    * row per `grp` (Mann–Whitney integer half-rank form). */
  def aucByGroup(df: DataFrame, grp: String, score: String,
                 pos: String): DataFrame =
    queries.Breadth138.aucByGroup(df, grp, score, pos)

  /** Per-source average precision of the n_chars score against the
    * is-English label (doc_id-tiebroken exact AP). */
  def avgPrecision(docs: DataFrame): DataFrame =
    queries.Breadth138.avgPrecision(docs)

  /** Decile calibration table + per-bin Brier of the pseudo-probability
    * (n_chars mod 101)/101 against the is-English label. */
  def calibrationTable(docs: DataFrame): DataFrame =
    queries.Breadth138.calibration(docs)

  /** Kneser–Ney bigram LM document scores + the corpus-micro-mean
    * perplexity gate (CCNet-style quality screen). */
  def kneserNeyScores(docs: DataFrame): DataFrame =
    queries.Breadth139.knScores(docs)

  /** KN continuation-probability head: tokens ranked by distinct left
    * contexts (the versatility KN backs off to). */
  def knContinuation(docs: DataFrame): DataFrame =
    queries.Breadth139.knContinuation(docs)

  /** Per-label polynomial-kernel MMD² drift vs the rest of the corpus
    * (explicit feature map — one linear pass, no pair enumeration). */
  def mmdDrift(embeddings: DataFrame): DataFrame =
    queries.Breadth140.mmdDrift(embeddings)

  /** Per-label drift attribution: the feature-map entry contributing
    * most to that label's MMD², with its share. */
  def mmdTopFeature(embeddings: DataFrame): DataFrame =
    queries.Breadth140.mmdTopFeature(embeddings)

  /** Distributed dense global rank (1..n) of `df` in `sortCols` order —
    * the scale-safe twin of `row_number() OVER (ORDER BY ...)`: range
    * partition + per-partition offsets, no single-partition window.
    * Sort keys must be unique (end them with a tiebreaker id). */
  def globalRank(df: DataFrame, out: String,
                 sortCols: org.apache.spark.sql.Column*): DataFrame =
    ops.GlobalRank.withGlobalRank(df, out, sortCols: _*)

  /** The global (label-blind) mutual-kNN edge set — **APPROXIMATE by
    * default**: the sub-quadratic projection-window build (sim.ProjGraph,
    * deterministic, linear in n) whose recall against brute-force ground
    * truth is MEASURED by q_mutual_recall, not assumed (directed top-4:
    * 1.0 at 500 random-noise vectors, ~0.6 at 2000 — far higher on
    * clustered corpora, which is what the clustered recall audit pins).
    * Every metric derived from this graph (modularity, cohesion,
    * closeness, reach, clustering coefficients) inherits that
    * approximation. Call [[mutualEdgesExact]] (Θ(n^1.5) IVF-pruned,
    * recall 1.0 by construction) when exact edges matter more than the
    * linear scale envelope. */
  def mutualEdges(embeddings: DataFrame, k: Int = 4): DataFrame =
    sim.ProjGraph.approxMutualEdges(embeddings, k)

  /** The exact IVF-pruned global mutual-kNN edges (recall 1.0 by
    * construction, Θ(n^1.5) — the recall audit's reference build). */
  def mutualEdgesExact(embeddings: DataFrame, k: Int = 4): DataFrame =
    queries.Breadth141.globalMutualEdgesExact(embeddings, k)

  /** Newman modularity of the label partition over the global
    * (label-blind) mutual-kNN graph — exact integer-rational arithmetic
    * over the **APPROXIMATE default graph** (see [[mutualEdges]]): the
    * Q value is exact FOR the projection-window edge set, which is an
    * audited approximation of the true mutual-kNN graph. Build edges
    * with [[mutualEdgesExact]] and call Breadth141.modularity directly
    * for the exact-graph figure. */
  def modularity(embeddings: DataFrame): DataFrame = {
    val edges = queries.Breadth141.globalMutualEdges(embeddings)
    queries.Breadth141.modularity(embeddings, edges)
  }

  /** Per-label cohesion over the global mutual-kNN graph: internal
    * edges, degree mass, and modularity contribution. Runs on the
    * **APPROXIMATE default graph** (see [[mutualEdges]]). */
  def labelCohesion(embeddings: DataFrame): DataFrame = {
    val edges = queries.Breadth141.globalMutualEdges(embeddings)
    queries.Breadth141.labelCohesion(embeddings, edges)
  }

  /** Nearest-centroid probe confusion matrix over the embeddings
    * (exact integer centroids + argmax assignment). */
  def centroidProbe(embeddings: DataFrame): DataFrame =
    queries.Breadth142.probeConfusion(embeddings)

  /** Nearest-centroid probe evaluation: accuracy + macro recall. */
  def centroidProbeEval(embeddings: DataFrame): DataFrame =
    queries.Breadth142.probeEval(embeddings)

  /** Margin-based bitext mining: mutual cross-lingual best matches
    * scored by the Artetxe–Schwenk ratio margin. */
  def bitextMine(embeddings: DataFrame, docs: DataFrame): DataFrame =
    queries.Breadth143.bitextMine(embeddings, docs)

  /** The bitext retrieval stage: every forward best match ranked by
    * ratio margin (top candidates table). */
  def bitextMargin(embeddings: DataFrame, docs: DataFrame): DataFrame =
    queries.Breadth143.bitextMargin(embeddings, docs)

  /** Difference-in-differences over the event stream (2×2 parity ×
    * calendar-midpoint design, exact cent-integer cell means). */
  def did(events: DataFrame): DataFrame =
    queries.Breadth144.did(events)

  /** Cohen's kappa between gold lang and the marker-word language-ID
    * heuristic (integer-rational chance correction). */
  def cohenKappa(docs: DataFrame): DataFrame =
    queries.Breadth144.cohenKappa(docs)

  /** Split-conformal audit: calibration quantile q̂ + test coverage
    * (md5-parity split, per-source floored-mean base predictor). */
  def conformal(docs: DataFrame): DataFrame =
    queries.Breadth145.conformal(docs)

  /** Per-source conformal coverage under the global q̂. */
  def conformalBySource(docs: DataFrame): DataFrame =
    queries.Breadth145.conformalBySource(docs)

  /** AMS tug-of-war F₂ audit: exact second moment vs the median-of-5
    * one-pass sketch. */
  def amsF2(docs: DataFrame): DataFrame =
    queries.Breadth146.amsF2(docs)

  /** The five AMS estimator rows (sign sums + estimates). */
  def amsSketches(docs: DataFrame): DataFrame =
    queries.Breadth146.amsSketches(docs)

  /** Wald SPRT per event stream: decision, crossing index, LLR. */
  def sprt(events: DataFrame): DataFrame =
    queries.Breadth147.sprt(events)

  /** Live SPRT screen (shared Breadth147.sprtStep on keyed state). */
  def liveSprt(events: org.apache.spark.sql.Dataset[streaming.SprtEvent])
      : org.apache.spark.sql.Dataset[streaming.SprtScored] =
    streaming.Streams.streamingSprt(events)

  /** Live mergeable AMS sketch per source (update stream). */
  def liveAmsSketch(docs: org.apache.spark.sql.Dataset[streaming.AmsDoc])
      : org.apache.spark.sql.Dataset[streaming.AmsSnap] =
    streaming.Streams.streamingAmsSketch(docs)

  /** Sequential pipeline-yield funnel: length → exact-dedup → KN
    * perplexity gate, one survival row per stage. */
  def pipelineYield(docs: DataFrame): DataFrame =
    queries.Breadth148.pipelineYield(docs)

  /** Independent-gate overlap counts (2³ combinations). */
  def gateOverlap(docs: DataFrame): DataFrame =
    queries.Breadth148.gateOverlap(docs)

  /** Neyman-optimal stratified sampling allocation over sources
    * (integer largest-remainder rounding; Σalloc = budget). */
  def neymanAllocation(docs: DataFrame, budget: Long = 100L): DataFrame =
    queries.Breadth149.neyman(docs, budget)

  /** Proportional-vs-Neyman design-variance audit. */
  def neymanEfficiency(docs: DataFrame, budget: Long = 100L): DataFrame =
    queries.Breadth149.neymanEfficiency(docs, budget)

  /** AMS inner-product join-size estimate (orders ⋈ lineitem shape):
    * exact size vs the median-of-5 sketch product. */
  def joinSizeEstimate(left: DataFrame, right: DataFrame): DataFrame =
    queries.Breadth150.joinSizeEst(left, right)

  /** k-anonymity audit over the (source, length-decile) QI. */
  def kAnonymity(docs: DataFrame): DataFrame =
    queries.Breadth151.kAnonymity(docs)

  /** l-diversity audit (sensitive attribute: lang). */
  def lDiversity(docs: DataFrame): DataFrame =
    queries.Breadth151.lDiversity(docs)

  /** The one-row dataset card (datasheet aggregates). */
  def datasetCard(docs: DataFrame): DataFrame =
    queries.Breadth152.datasetCard(docs)

  /** Per-language dataset cards. */
  def datasetCardByLang(docs: DataFrame): DataFrame =
    queries.Breadth152.datasetCardByLang(docs)

  /** Temperature-α=0.5 source mixing shares + oversample factors. */
  def temperatureMix(docs: DataFrame): DataFrame =
    queries.Breadth153.temperatureMix(docs)

  /** Deterministic keyed per-epoch visit order (training manifest). */
  def epochRanks(docs: DataFrame, epochs: Int = 3): DataFrame =
    queries.Breadth153.epochRanks(docs, epochs)

  /** From-scratch 64-register HyperLogLog estimate vs exact distinct
    * (md5 registers, replayable arithmetic). */
  def hllEstimate(docs: DataFrame): DataFrame =
    queries.Breadth154.hllEstimate(docs)

  /** The filled HLL register table (mergeable by max). */
  def hllRegisters(docs: DataFrame): DataFrame =
    queries.Breadth154.hllRegisters(docs)

  /** Percolation curve of the global cosine graph (dedup-threshold
    * tuning table). */
  def percolation(embeddings: DataFrame): DataFrame =
    queries.Breadth155.percolation(embeddings)

  /** Similarity-graph hubs at the house threshold (cluster-center
    * safety audit). */
  def degreeHubs(embeddings: DataFrame): DataFrame =
    queries.Breadth155.degreeHubs(embeddings)

  /** Exact kNN-Shapley data valuation: top-10 most valuable training
    * vectors per probe. */
  def knnShapley(embeddings: DataFrame): DataFrame =
    queries.Breadth156.knnShapley(embeddings)

  /** Aggregate kNN-Shapley valuation per training label. */
  def shapleyByLabel(embeddings: DataFrame): DataFrame =
    queries.Breadth156.shapleyByLabel(embeddings)

  /** t-closeness release verdict (max class TVD vs the global lang
    * distribution). */
  def tCloseness(docs: DataFrame): DataFrame =
    queries.Breadth157.tCloseness(docs)

  /** The top-10 t-closeness audit worklist. */
  def tWorstClasses(docs: DataFrame): DataFrame =
    queries.Breadth157.tWorstClasses(docs)

  /** Weight-of-evidence bins + information value of the quantity
    * bucket against the returned outcome. */
  def woeIv(lineitem: DataFrame): DataFrame =
    queries.Breadth158.woeIv(lineitem)

  /** m-estimate smoothed target encoding of the supplier key. */
  def targetEncode(lineitem: DataFrame): DataFrame =
    queries.Breadth158.targetEncode(lineitem)

  /** Gains/lift table over exact score-rank deciles. */
  def liftDeciles(docs: DataFrame): DataFrame =
    queries.Breadth159.liftDeciles(docs)

  /** Murphy decomposition of the Brier score (reliability /
    * resolution / uncertainty / residual). */
  def brierDecomp(docs: DataFrame): DataFrame =
    queries.Breadth159.brierDecomp(docs)

  /** McNemar's paired test between the length and perplexity gates. */
  def mcnemar(docs: DataFrame): DataFrame =
    queries.Breadth160.mcnemar(docs)

  /** Cochran's Q over the three independent quality gates. */
  def cochranQ(docs: DataFrame): DataFrame =
    queries.Breadth160.cochranQ(docs)

  /** Tie-aware ordinal association (gamma, Somers' D, tau-b) between
    * priority and the price quintile. */
  def ordinalAssoc(orders: DataFrame): DataFrame =
    queries.Breadth161.ordinalAssoc(orders)

  /** Theil's uncertainty coefficients between source and lang. */
  def theilU(docs: DataFrame): DataFrame =
    queries.Breadth161.theilU(docs)

  /** Per-source quantile-normalization audit. */
  def quantileNorm(docs: DataFrame): DataFrame =
    queries.Breadth162.quantileNorm(docs)

  /** The quantile-normalization mapping (bounded doc_id < 100 slice). */
  def quantileNormMap(docs: DataFrame): DataFrame =
    queries.Breadth162.quantileNormMap(docs)

  /** Horvitz–Thompson total-quantity estimate under the two-stratum
    * md5 design. */
  def horvitzThompson(lineitem: DataFrame): DataFrame =
    queries.Breadth163.horvitzThompson(lineitem)

  /** Delete-one-supplier jackknife table for the revenue/quantity
    * ratio. */
  def jackknife(lineitem: DataFrame): DataFrame =
    queries.Breadth163.jackknife(lineitem)

  /** One-row jackknife SE summary. */
  def jackknifeSe(lineitem: DataFrame): DataFrame =
    queries.Breadth163.jackknifeSe(lineitem)

  /** Friedman χ² + Kendall's W over month-blocked priority revenue. */
  def friedman(orders: DataFrame): DataFrame =
    queries.Breadth164.friedman(orders)

  /** The per-priority Friedman rank profile. */
  def friedmanRanks(orders: DataFrame): DataFrame =
    queries.Breadth164.friedmanRanks(orders)

  /** Per-probe first-relevant-hit ranks and reciprocal ranks. */
  def firstHit(embeddings: DataFrame): DataFrame =
    queries.Breadth165.firstHitTable(embeddings)

  /** MRR + hit@1/5/10 retrieval roll-up. */
  def mrr(embeddings: DataFrame): DataFrame =
    queries.Breadth165.mrr(embeddings)

  /** Chao1 / Good–Turing vocabulary-richness estimators. */
  def vocabRichness(docs: DataFrame): DataFrame =
    queries.Breadth166.vocabRichness(docs)

  /** Chapman capture-recapture vocabulary estimate. */
  def captureRecapture(docs: DataFrame): DataFrame =
    queries.Breadth166.captureRecapture(docs)

  /** Rendezvous-hashing 8-shard assignment histogram. */
  def rendezvous(docs: DataFrame): DataFrame =
    queries.Breadth167.rendezvous(docs)

  /** The 8→9 resize movement audit (HRW vs mod-N). */
  def rendezvousResize(docs: DataFrame): DataFrame =
    queries.Breadth167.rendezvousResize(docs)

  /** Per-source Jensen–Shannon divergence vs the rest of the corpus. */
  def jsDivergence(docs: DataFrame): DataFrame =
    queries.Breadth168.jsDivergence(docs)

  /** Median-of-means vs the plain mean for line revenue. */
  def medianOfMeans(lineitem: DataFrame): DataFrame =
    queries.Breadth168.medianOfMeans(lineitem)

  /** Closeness/harmonic centrality from the seed panel. */
  def closeness(mutualEdges: DataFrame): DataFrame =
    queries.Breadth169.closeness(mutualEdges)

  /** The pooled hop expansion curve. */
  def reachCurve(mutualEdges: DataFrame): DataFrame =
    queries.Breadth169.reachCurve(mutualEdges)

  /** Per-source stylometric z-profiles (top-5 tokens). */
  def styloProfile(docs: DataFrame): DataFrame =
    queries.Breadth170.styloProfile(docs)

  /** Burrows' Delta source-pair distances, most similar first. */
  def burrowsDelta(docs: DataFrame): DataFrame =
    queries.Breadth170.burrowsDelta(docs)

  /** Isotonic (minimax/PAVA) calibration of the pseudo-probability. */
  def isotonicCalibration(docs: DataFrame): DataFrame =
    queries.Breadth171.isotonicCalibration(docs)

  /** ECE before/after isotonic fitting. */
  def calibrationError(docs: DataFrame): DataFrame =
    queries.Breadth171.calibrationError(docs)

  /** Per-source Hill diversity numbers ⁰D/¹D/²D. */
  def hillNumbers(docs: DataFrame): DataFrame =
    queries.Breadth172.hillNumbers(docs)

  /** Effective number of sources. */
  def sourceEffective(docs: DataFrame): DataFrame =
    queries.Breadth172.sourceEffective(docs)

  /** Two-sample Cramér–von Mises (en vs non-en lengths). */
  def cvm(docs: DataFrame): DataFrame = queries.Breadth173.cvm(docs)

  /** Mood's median test (en vs non-en lengths). */
  def moodMedian(docs: DataFrame): DataFrame =
    queries.Breadth173.moodMedian(docs)

  /** Rich-club curve of an undirected edge set. */
  def richClub(mutualEdges: DataFrame): DataFrame =
    queries.Breadth174.richClub(mutualEdges)

  /** Local clustering-coefficient histogram. */
  def localClustering(mutualEdges: DataFrame): DataFrame =
    queries.Breadth174.localClustering(mutualEdges)

  /** Synthetic-control daily effects for the treated cohort. */
  def synthControl(events: DataFrame): DataFrame =
    queries.Breadth175.synthControl(events)

  /** Placebo distribution over all pretend-treated cohorts. */
  def placebo(events: DataFrame): DataFrame =
    queries.Breadth175.placebo(events)

  /** Laplace-noised histogram in the DP release SHAPE — NOT a real
    * privacy mechanism as shipped. The noise is a deterministic,
    * publicly replayable md5 inverse-CDF transform (an oracle-testable
    * stand-in for Lap(1/ε) draws), and the output includes the exact
    * true count column `n` alongside `noisy_count`. A production
    * release must (1) swap the md5 draw for a CSPRNG, (2) drop the `n`
    * and `noise` columns, and (3) account ε across repeated releases —
    * see the Breadth176 module doc. */
  def dpHistogram(docs: DataFrame): DataFrame =
    queries.Breadth176.dpHistogram(docs)

  /** DP release utility accountant. */
  def dpUtility(docs: DataFrame): DataFrame =
    queries.Breadth176.dpUtility(docs)

  /** Stratified propensity design table. */
  def propensityTable(events: DataFrame): DataFrame =
    queries.Breadth177.propensityTable(events)

  /** Naive vs inverse-propensity-weighted ATT. */
  def ipwAtt(events: DataFrame): DataFrame =
    queries.Breadth177.ipwAtt(events)

  /** Good–Turing frequency-of-frequencies table over 3-token shingle
    * document frequencies: r, N_r, N_{r+1}, r* = (r+1)·N_{r+1}/N_r. */
  def goodTuring(docs: DataFrame): DataFrame =
    queries.Breadth178.goodTuring(queries.Breadth178.shingleDf(docs))

  /** Good–Turing unseen-mass gauge: P₀ = N₁/N and the hapax share of
    * the shingle vocabulary. */
  def unseenMass(docs: DataFrame): DataFrame =
    queries.Breadth178.unseenMass(queries.Breadth178.shingleDf(docs))

  /** Rank-biased overlap (p = 3/4, depth 5) between two per-probe
    * rank lists carrying (probe_id, rank, neighbor_id). */
  def rbo(exact: DataFrame, approx: DataFrame): DataFrame =
    queries.Breadth178.rbo(exact, approx)

  /** LSH S-curve (r = 3, b = 4) against the observed probe-pair
    * Jaccard histogram: expected near-dup capture per similarity
    * bucket. */
  def lshPower(docs: DataFrame): DataFrame =
    queries.Breadth178.lshPower(docs)

  /** Frequent sequential patterns (subsequence support, apriori
    * level-wise) over each user's first-8-event journey. */
  def seqPatterns(events: DataFrame): DataFrame =
    queries.Breadth178.seqPatterns(events)

  /** Streaming twin of [[seqPatterns]]' prefix build: per-key bounded
    * first-8 journey state via `transformWithState` (update stream,
    * frozen at 8). Spec-pinned equal to the batch prefix across
    * micro-batch splits — see streaming.Streams.streamingJourney. */
  def liveJourney(events: org.apache.spark.sql.Dataset[streaming.EventRow])
      : org.apache.spark.sql.Dataset[streaming.JourneySnap] =
    streaming.Streams.streamingJourney(events)

  /** Stream-static screen of live journey snapshots against an
    * offline-mined pattern table ([[seqPatterns]] output) — one row
    * per (journey, matched pattern), stateless broadcast LIKE join. */
  def liveJourneyMatches(journeys: DataFrame, patterns: DataFrame): DataFrame =
    streaming.Streams.journeyMatches(journeys, patterns)
}
