package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifty-fifth wave — volume structure: the volume profile and OBV
  * divergence.
  *
  *  - **q_volume_profile**: volume-at-price — each key's close range
  *    split into 10 equal-width integer bins (bucket = (c−min)·10 div
  *    (max−min+1), pure integer), per-bin day count, traded volume,
  *    volume share and the point-of-control flag (the max-volume bin,
  *    ties to the lower price). The profile is how execution desks
  *    read where liquidity concentrated; here it is one bar⋈vol join
  *    + one (key, bucket) aggregate over the memoized grids.
  *  - **q_obv_divergence**: on-balance-volume divergence — daily OBV
  *    as a cumulative signed-volume prefix sum (integer), flagged
  *    where the 5-bar price change and the 5-bar OBV change disagree
  *    in sign (bearish: price up on falling OBV; bullish: the
  *    mirror). The classic volume-confirmation screen, all integer
  *    comparisons.
  *
  * Scale shape: both ride the memoized day-bar/day-vol chains; one
  * extra key-partitioned window each; outputs are integers or single
  * divisions. */
object Breadth54 {

  private[graft] val ProfileBins = 10
  private[graft] val DivLookback = 5

  private def barsWithVols(df: DataFrame, keyCol: String, tsCol: String,
                           valCol: String, tieBreak: String,
                           qtyJsonField: String): DataFrame =
    Breadth13.dayBarsCents(df, keyCol, tsCol, valCol, tieBreak)
      .select(col(keyCol), col("day"), col("close"))
      .join(Breadth27.dayVols(df, keyCol, tsCol, qtyJsonField),
        Seq(keyCol, "day"))

  private[graft] def volumeProfile(df: DataFrame, keyCol: String,
                                   tsCol: String, valCol: String,
                                   tieBreak: String,
                                   qtyJsonField: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    val d = barsWithVols(df, keyCol, tsCol, valCol, tieBreak, qtyJsonField)
      .withColumn("__mn", min(col("close")).over(byKey))
      .withColumn("__mx", max(col("close")).over(byKey))
      .withColumn("bucket",
        expr(s"((close - __mn) * $ProfileBins) div (__mx - __mn + 1)"))
    val g = d.groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n_days"), sum(col("__v")).as("vol"))
      .withColumn("__tot", sum(col("vol")).over(byKey))
    val poc = Window.partitionBy(col(keyCol))
      .orderBy(col("vol").desc, col("bucket").asc)
    g.withColumn("__r", row_number().over(poc))
      .select(col(keyCol), col("bucket"), col("n_days"), col("vol"),
        (col("vol").cast("double") / col("__tot").cast("double"))
          .as("vol_share"),
        (col("__r") === 1).as("is_poc"))
      .orderBy(col(keyCol).asc, col("bucket").asc)
  }

  private[graft] def obvDivergence(df: DataFrame, keyCol: String,
                                   tsCol: String, valCol: String,
                                   tieBreak: String,
                                   qtyJsonField: String): DataFrame = {
    val byDay = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val run = byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d = barsWithVols(df, keyCol, tsCol, valCol, tieBreak, qtyJsonField)
      .withColumn("__pc", lag(col("close"), 1).over(byDay))
      .withColumn("__sv",
        when(col("__pc").isNull || col("close") === col("__pc"), lit(0L))
          .when(col("close") > col("__pc"), col("__v"))
          .otherwise(-col("__v")))
      .withColumn("obv", sum(col("__sv")).over(run))
      .withColumn("__i", row_number().over(byDay))
      .withColumn("__pchg",
        col("close") - lag(col("close"), DivLookback).over(byDay))
      .withColumn("__ochg",
        col("obv") - lag(col("obv"), DivLookback).over(byDay))
    d.filter(col("__i") > DivLookback)
      .select(col(keyCol), col("day"),
        (col("close").cast("double") / lit(100.0)).as("close"),
        col("obv"), col("__pchg").as("price_chg_cents"),
        col("__ochg").as("obv_chg"),
        (col("__pchg") > 0 && col("__ochg") < 0).as("bearish_div"),
        (col("__pchg") < 0 && col("__ochg") > 0).as("bullish_div"))
      .orderBy(col(keyCol).asc, col("day").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_volume_profile" -> ((s, dir) =>
      volumeProfile(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id", "k")),
    "q_obv_divergence" -> ((s, dir) =>
      obvDivergence(Tables.events(s, dir), "user_id", "ts", "value",
        "event_id", "k")))

  private val bvSql =
    """t AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, ts, event_id,
      |    props
      |  FROM events),
      |bars AS (
      |  SELECT user_id, day, max(cl) AS close
      |  FROM (
      |    SELECT user_id, day,
      |      last_value(c) OVER (PARTITION BY user_id, day ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cl
      |    FROM t)
      |  GROUP BY user_id, day),
      |vols AS (
      |  SELECT user_id, day,
      |    CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
      |      AS BIGINT) AS v
      |  FROM t GROUP BY user_id, day
      |  HAVING sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
      |    IS NOT NULL),
      |bv AS (
      |  SELECT b.user_id, b.day, b.close, v.v
      |  FROM bars b JOIN vols v ON v.user_id = b.user_id AND v.day = b.day)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_volume_profile" ->
      s"""WITH $bvSql,
         |rng AS (
         |  SELECT user_id, day, close, v,
         |    min(close) OVER (PARTITION BY user_id) AS mn,
         |    max(close) OVER (PARTITION BY user_id) AS mx
         |  FROM bv),
         |bkt AS (
         |  SELECT user_id,
         |    ((close - mn) * $ProfileBins) // (mx - mn + 1) AS bucket, v
         |  FROM rng),
         |g AS (
         |  SELECT user_id, bucket, CAST(count(*) AS BIGINT) AS n_days,
         |    CAST(sum(v) AS BIGINT) AS vol
         |  FROM bkt GROUP BY 1, 2),
         |sh AS (
         |  SELECT *, CAST(sum(vol) OVER (PARTITION BY user_id) AS BIGINT)
         |      AS tot,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY vol DESC, bucket) AS r
         |  FROM g)
         |SELECT user_id, bucket, n_days, vol,
         |  CAST(vol AS DOUBLE) / CAST(tot AS DOUBLE) AS vol_share,
         |  r = 1 AS is_poc
         |FROM sh ORDER BY user_id, bucket""".stripMargin,

    "q_obv_divergence" ->
      s"""WITH $bvSql,
         |sv AS (
         |  SELECT user_id, day, close, v,
         |    lag(close) OVER w AS pc
         |  FROM bv
         |  WINDOW w AS (PARTITION BY user_id ORDER BY day)),
         |ob AS (
         |  SELECT user_id, day, close,
         |    CAST(sum(CASE WHEN pc IS NULL OR close = pc THEN 0
         |      WHEN close > pc THEN v ELSE -v END)
         |      OVER (PARTITION BY user_id ORDER BY day
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS obv,
         |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS i
         |  FROM sv),
         |dv AS (
         |  SELECT user_id, day, close, obv, i,
         |    close - lag(close, $DivLookback) OVER w AS pchg,
         |    obv - lag(obv, $DivLookback) OVER w AS ochg
         |  FROM ob
         |  WINDOW w AS (PARTITION BY user_id ORDER BY day))
         |SELECT user_id, day, CAST(close AS DOUBLE) / 100.0 AS close, obv,
         |  pchg AS price_chg_cents, ochg AS obv_chg,
         |  pchg > 0 AND ochg < 0 AS bearish_div,
         |  pchg < 0 AND ochg > 0 AS bullish_div
         |FROM dv WHERE i > $DivLookback
         |ORDER BY user_id, day""".stripMargin)
}
