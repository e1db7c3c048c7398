package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hundred-twenty-ninth wave — corpus class-profile operators:
  *
  *  - **q_distinctive_tokens**: the top-5 over-represented tokens per
  *    language — the c-TF-IDF / log-odds idea reduced to an EXACT
  *    integer ranking: score(t, c) = tf_c·(T − T_c) − tf_¬c·T_c (the
  *    cross-multiplied lift numerator — positive iff the token's
  *    in-class share beats its out-of-class share; no logs, no
  *    floats, bit-stable to rank on). A tf_c ≥ 5 noise floor keeps
  *    hapax junk out without a scale-dependent screen.
  *  - **q_vocab_overlap**: pairwise vocabulary Jaccard between
  *    languages over distinct token sets — the cross-class
  *    contamination meter (|langs|² pairs, token-level anti-joins,
  *    exact integers).
  *
  * Scale shape: both are one token explode + |vocab|-bounded
  * aggregates; the pair grid is |langs|², never token×token. */
object Breadth128 {

  private val TopN = 5
  private val MinTf = 5L

  private def toks(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
      explode(graft.text.Text.tokens(col("text"))).as("tok"))

  /** Top-5 over-represented tokens per language by exact integer
    * lift. */
  private[graft] def distinctiveTokens(docs: DataFrame): DataFrame = {
    val tf = toks(docs).groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val perLang = tf.groupBy(col("lang")).agg(sum(col("tf")).as("__tc"))
    val perTok = tf.groupBy(col("tok")).agg(sum(col("tf")).as("__ta"))
    val tot = tf.agg(sum(col("tf")).as("__t"))
    val scored = tf
      .join(broadcast(perLang), Seq("lang"))
      .join(perTok, Seq("tok"))
      .crossJoin(broadcast(tot))
      .filter(col("tf") >= MinTf)
      .select(col("lang"), col("tok"), col("tf"),
        (col("tf") * (col("__t") - col("__tc")) -
          (col("__ta") - col("tf")) * col("__tc")).as("lift_num"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("lift_num").desc, col("tok").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopN)
      .select(col("lang"), col("rank"), col("tok"), col("tf"),
        col("lift_num"))
      .orderBy(col("lang").asc, col("rank").asc)
  }

  /** Pairwise vocabulary Jaccard between languages. */
  private[graft] def vocabOverlap(docs: DataFrame): DataFrame = {
    val v = toks(docs).select(col("lang"), col("tok")).distinct()
      .localCheckpoint()
    val sizes = v.groupBy(col("lang")).agg(count(lit(1)).as("__n"))
    val inter = v.select(col("lang").as("lang_a"), col("tok"))
      .join(v.select(col("lang").as("lang_b"), col("tok")), Seq("tok"))
      .filter(col("lang_a") < col("lang_b"))
      .groupBy(col("lang_a"), col("lang_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.select(col("lang").as("lang_a"),
        col("__n").as("n_a"))), Seq("lang_a"))
      .join(broadcast(sizes.select(col("lang").as("lang_b"),
        col("__n").as("n_b"))), Seq("lang_b"))
      .select(col("lang_a"), col("lang_b"), col("n_a"), col("n_b"),
        col("n_inter"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
          .as("vocab_jaccard"))
      .orderBy(col("lang_a").asc, col("lang_b").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_distinctive_tokens" -> ((s, dir) =>
      distinctiveTokens(Tables.documents(s, dir))),
    "q_vocab_overlap" -> ((s, dir) =>
      vocabOverlap(Tables.documents(s, dir))))

  private val TokSql =
    """tok AS (
      |  SELECT lang, unnest(regexp_split_to_array(
      |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
      |    AS tok
      |  FROM documents)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_distinctive_tokens" ->
      s"""WITH $TokSql,
         |tf AS (
         |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok GROUP BY 1, 2),
         |pl AS (SELECT lang, CAST(sum(tf) AS BIGINT) AS tc
         |  FROM tf GROUP BY 1),
         |pt AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS ta
         |  FROM tf GROUP BY 1),
         |t AS (SELECT CAST(sum(tf) AS BIGINT) AS t FROM tf),
         |scored AS (
         |  SELECT tf.lang, tf.tok, tf.tf,
         |    tf.tf * ((SELECT t FROM t) - pl.tc)
         |      - (pt.ta - tf.tf) * pl.tc AS lift_num
         |  FROM tf JOIN pl ON pl.lang = tf.lang
         |          JOIN pt ON pt.tok = tf.tok
         |  WHERE tf.tf >= $MinTf),
         |rk AS (
         |  SELECT lang, tok, tf, lift_num,
         |    CAST(row_number() OVER (PARTITION BY lang
         |      ORDER BY lift_num DESC, tok) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT lang, rank, tok, tf, lift_num
         |FROM rk WHERE rank <= $TopN
         |ORDER BY lang, rank""".stripMargin,

    "q_vocab_overlap" ->
      s"""WITH $TokSql,
         |v AS (SELECT DISTINCT lang, tok FROM tok),
         |sz AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
         |  FROM v GROUP BY 1),
         |inter AS (
         |  SELECT a.lang AS lang_a, b.lang AS lang_b,
         |    CAST(count(*) AS BIGINT) AS n_inter
         |  FROM v a JOIN v b ON a.tok = b.tok AND a.lang < b.lang
         |  GROUP BY 1, 2)
         |SELECT lang_a, lang_b, sa.n AS n_a, sb.n AS n_b, n_inter,
         |  CAST(n_inter AS DOUBLE)
         |    / CAST(sa.n + sb.n - n_inter AS DOUBLE) AS vocab_jaccard
         |FROM inter
         |JOIN sz sa ON sa.lang = inter.lang_a
         |JOIN sz sb ON sb.lang = inter.lang_b
         |ORDER BY lang_a, lang_b""".stripMargin)
}
