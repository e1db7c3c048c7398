package graft.queries

import graft.Tables
import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Eighty-eighth wave — keyword extraction and corpus-profile text ops.
  *
  *  - **q_rake_keywords**: RAKE keyword extraction over the corpus —
  *    candidate phrases are maximal stopword-free token runs (the
  *    gaps-and-islands build keyed by a running stopword count), word
  *    scores are deg/freq over ALL candidate occurrences (deg sums the
  *    host phrase length per occurrence), and a phrase scores the sum
  *    of its words' ratios accumulated in POSITION order (ordered
  *    running window — the q_chi2 float discipline), 6-dp-rounded.
  *    Top 15 by (score, phrase).
  *  - **q_lang_trigrams**: the classic language-ID profile table —
  *    top-5 character trigrams per language label by exact count,
  *    (count DESC, gram ASC) tie-broken. |langs|·|gram domain|
  *    aggregate, rank pruned per partition.
  *  - **q_token_gini**: token-frequency concentration per source — the
  *    Gini coefficient over the source's token-count distribution from
  *    exact integer rank·count sums (the q_gini altitude: aggregates
  *    over the |vocab|-bounded count table, never raw tokens).
  *
  * Scale shape: all three explode tokens/grams once, aggregate
  * map-side to vocab-bounded tables, and do rank/window work on those
  * tables only. The RAKE word-stat join is |vocab|-sized (broadcast). */
object Breadth87 {

  private[graft] val RakeTopN = 15
  private[graft] val TrigramTopK = 5

  /** RAKE top phrases with deg/freq scoring. */
  private[graft] def rakeKeywords(docs: DataFrame, idCol: String,
                                  textCol: String,
                                  topN: Int = RakeTopN): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"),
        posexplode(Text.tokens(col(textCol))).as(Seq("__pos", "__tok")))
      .withColumn("__stop", col("__tok").isin(Text.stopwords.map(x => x: Any): _*))
    val w = Window.partitionBy(col("__id")).orderBy(col("__pos").asc)
    val ph = toks
      .withColumn("__sid", sum(when(col("__stop"), 1L).otherwise(0L))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(!col("__stop"))
      .select(col("__id"), col("__sid"), col("__pos"), col("__tok"))
    val plen = ph.groupBy(col("__id"), col("__sid"))
      .agg(count(lit(1)).as("__plen"))
    val withLen = ph.join(plen, Seq("__id", "__sid"))
    val wordStats = withLen.groupBy(col("__tok"))
      .agg(count(lit(1)).as("__freq"), sum(col("__plen")).as("__deg"))
    val wp = Window.partitionBy(col("__id"), col("__sid"))
      .orderBy(col("__pos").asc)
    val scored = ph.join(broadcast(wordStats), Seq("__tok"))
      .withColumn("__ratio",
        col("__deg").cast("double") / col("__freq").cast("double"))
      .withColumn("__run", sum(col("__ratio"))
        .over(wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__rn", row_number().over(wp))
      .withColumn("__cnt", count(lit(1))
        .over(Window.partitionBy(col("__id"), col("__sid"))))
    val phraseScore = scored.filter(col("__rn") === col("__cnt"))
      .select(col("__id"), col("__sid"), col("__run").as("__score"))
    val phraseTxt = ph.groupBy(col("__id"), col("__sid"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("__pos"), col("__tok")))),
        x => x.getField("__tok")), " ").as("phrase"),
        count(lit(1)).as("__nw"))
    phraseTxt.join(phraseScore, Seq("__id", "__sid"))
      .groupBy(col("phrase"))
      .agg(max(col("__nw")).as("n_words"),
        count(lit(1)).as("n_occur"),
        round(max(col("__score")), 6).as("score"))
      .orderBy(col("score").desc, col("phrase").asc)
      .limit(topN)
  }

  /** Top-k character trigrams per language label. */
  private[graft] def langTrigrams(docs: DataFrame, langCol: String,
                                  textCol: String,
                                  k: Int = TrigramTopK): DataFrame = {
    val g = docs.select(col(langCol).as("lang"),
        Text.norm(col(textCol)).as("__s"))
      .select(col("lang"), explode(Text.charGramsRaw(col("__s"), 3))
        .as("gram"))
    val counts = g.groupBy(col("lang"), col("gram"))
      .agg(count(lit(1)).as("n_occur"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_occur").desc, col("gram").asc)
    counts.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("gram"), col("n_occur"))
      .orderBy(col("lang").asc, col("rank").asc)
  }

  /** Gini of the token-frequency distribution per source. */
  private[graft] def tokenGini(docs: DataFrame, srcCol: String,
                               textCol: String): DataFrame = {
    val c = docs.select(col(srcCol).as("source"),
        explode(Text.tokens(col(textCol))).as("__tok"))
      .groupBy(col("source"), col("__tok"))
      .agg(count(lit(1)).as("__c"))
    val ord = Window.partitionBy(col("source"))
      .orderBy(col("__c").asc, col("__tok").asc)
    val g = c.withColumn("__i", row_number().over(ord).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("__c")).as("n_tokens"),
        sum(col("__i") * col("__c")).as("__t"))
    g.select(col("source"), col("n_types"), col("n_tokens"),
      ((lit(2.0) * col("__t").cast("double")) /
        (col("n_types").cast("double") * col("n_tokens").cast("double")) -
        (col("n_types") + 1).cast("double") / col("n_types").cast("double"))
        .as("gini"))
      .orderBy(col("source").asc)
  }

  val defs: Map[String, Q] = Map(
    "q_rake_keywords" -> ((s, dir) =>
      rakeKeywords(Tables.documents(s, dir), "doc_id", "text")),
    "q_lang_trigrams" -> ((s, dir) =>
      langTrigrams(Tables.documents(s, dir), "lang", "text")),
    "q_token_gini" -> ((s, dir) =>
      tokenGini(Tables.documents(s, dir), "source", "text")))

  private val stopIn = Text.stopwords.map(s => s"'$s'").mkString(", ")

  val oracle: Map[String, String] = Map(
    "q_rake_keywords" ->
      s"""WITH t AS (SELECT doc_id, ${Extensions.sqlTokens("text")} AS v
         |  FROM documents),
         |tok AS (SELECT doc_id, unnest(v) AS tok,
         |    unnest(range(1, len(v) + 1)) AS pos
         |  FROM t),
         |st AS (SELECT doc_id, pos, tok,
         |    CASE WHEN tok IN ($stopIn) THEN 1 ELSE 0 END AS stop
         |  FROM tok),
         |ph AS (SELECT doc_id, pos, tok, sid FROM (
         |    SELECT doc_id, pos, tok, stop,
         |      sum(stop) OVER (PARTITION BY doc_id ORDER BY pos
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |    FROM st)
         |  WHERE stop = 0),
         |pl AS (SELECT doc_id, sid, CAST(count(*) AS BIGINT) AS plen
         |  FROM ph GROUP BY 1, 2),
         |ws AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq,
         |    CAST(sum(plen) AS BIGINT) AS deg
         |  FROM ph JOIN pl USING (doc_id, sid) GROUP BY tok),
         |sc AS (SELECT ph.doc_id, ph.sid, ph.pos,
         |    CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) AS ratio
         |  FROM ph JOIN ws USING (tok)),
         |run AS (SELECT doc_id, sid,
         |    sum(ratio) OVER (PARTITION BY doc_id, sid ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r,
         |    row_number() OVER (PARTITION BY doc_id, sid ORDER BY pos)
         |      AS rn,
         |    count(*) OVER (PARTITION BY doc_id, sid) AS cnt
         |  FROM sc),
         |px AS (SELECT doc_id, sid, r AS score FROM run WHERE rn = cnt),
         |ptxt AS (SELECT doc_id, sid,
         |    string_agg(tok, ' ' ORDER BY pos) AS phrase,
         |    CAST(count(*) AS BIGINT) AS nw
         |  FROM ph GROUP BY 1, 2)
         |SELECT phrase, CAST(max(nw) AS BIGINT) AS n_words,
         |  CAST(count(*) AS BIGINT) AS n_occur,
         |  round(max(score), 6) AS score
         |FROM ptxt JOIN px USING (doc_id, sid)
         |GROUP BY phrase
         |ORDER BY score DESC, phrase
         |LIMIT $RakeTopN""".stripMargin,

    "q_lang_trigrams" ->
      s"""WITH t AS (SELECT lang, ${Extensions.sqlNorm("text")} AS s
         |  FROM documents),
         |g AS (SELECT lang, unnest(list_transform(
         |    range(1, greatest(length(s) - 2, 1) + 1),
         |    i -> substr(s, i, 3))) AS gram
         |  FROM t),
         |c AS (SELECT lang, gram, CAST(count(*) AS BIGINT) AS n_occur
         |  FROM g GROUP BY 1, 2),
         |r AS (SELECT lang, gram, n_occur,
         |    CAST(row_number() OVER (PARTITION BY lang
         |      ORDER BY n_occur DESC, gram) AS INTEGER) AS rank
         |  FROM c)
         |SELECT lang, rank, gram, n_occur FROM r
         |WHERE rank <= $TrigramTopK
         |ORDER BY lang, rank""".stripMargin,

    "q_token_gini" ->
      s"""WITH tok AS (SELECT source,
         |    unnest(${Extensions.sqlTokens("text")}) AS tok
         |  FROM documents),
         |c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
         |  FROM tok GROUP BY 1, 2),
         |r AS (SELECT source, c,
         |    CAST(row_number() OVER (PARTITION BY source ORDER BY c, tok)
         |      AS BIGINT) AS i
         |  FROM c),
         |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(c) AS BIGINT) AS s, CAST(sum(i * c) AS BIGINT) AS t
         |  FROM r GROUP BY 1)
         |SELECT source, n AS n_types, s AS n_tokens,
         |  (2.0 * CAST(t AS DOUBLE))
         |    / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
         |    - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS gini
         |FROM g ORDER BY source""".stripMargin)
}
