package graft

import graft.queries.Breadth34
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the thirty-fourth wave (Breadth34 Connors
  * composite + tokenizer fertility). */
class Wave34Spec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Long, String)]) =
    rows.toDF("user_id", "value", "event_id", "at")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", lit("{}"))

  private def day(i: Int) =
    java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1).toString + " 10:00:00"

  private def series(closes: Seq[Long], key: Long = 1L) =
    closes.zipWithIndex.map { case (c, i) =>
      (key, c.toDouble / 100.0, i.toLong + 1, day(i + 1))
    }

  test("connorsRsi: the hand fold pins every component over a mixed " +
    "series; warm-ups gate each component independently") {
    val closes = Seq(1000L, 1010L, 990L, 1005L, 1005L, 1020L, 1010L, 1030L)
    val got = Breadth34.connorsRsi(ticks(series(closes)),
      "user_id", "ts", "value", "event_id")
      .orderBy("day")
      .select("streak", "rsi3", "rsi2_streak", "pct_rank", "crsi")
      .as[(Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().toSeq
    var st: Option[Breadth34.CrsiAcc] = None
    val want = closes.zipWithIndex.map { case (c, i) =>
      val a = Breadth34.crsiStep(st, c, i)
      st = Some(a)
      (a.streak, a.rsi3, a.rsi2, a.pr,
        (a.rsi3, a.rsi2, a.pr) match {
          case (Some(x), Some(y), Some(z)) => Some((x + y + z) / 3.0)
          case _ => None
        })
    }
    assert(got === want)
    // streak series: 0,1,-1,1,0,1,-1,1
    assert(got.map(_._1) === Seq(0L, 1L, -1L, 1L, 0L, 1L, -1L, 1L))
    // rsi3 defined from bar 4 (3 diffs), rsi2 from bar 3 (2 diffs)
    assert(got(2)._2.isEmpty && got(3)._2.nonEmpty)
    assert(got(1)._3.isEmpty && got(2)._3.nonEmpty)
    // pct_rank needs 100 prior returns — absent on an 8-bar series
    assert(got.forall(_._4.isEmpty) && got.forall(_._5.isEmpty))
  }

  test("connorsRsi: with 100+ prior returns the percent rank scores " +
    "and the composite fires; a max up-move ranks 100") {
    // 103 bars: 101 alternating small moves, then a huge up day
    val closes = (0 until 102).map(i =>
      if (i % 2 == 0) 10000L else 10010L) :+ 20000L
    val got = Breadth34.connorsRsi(ticks(series(closes)),
      "user_id", "ts", "value", "event_id")
      .orderBy("day").select("pct_rank", "crsi")
      .as[(Option[Double], Option[Double])].collect().toSeq
    // bar 102 (0-based 101): the 101st return exists; ring filled at 100
    val scored = got.filter(_._1.nonEmpty)
    assert(scored.nonEmpty)
    // the final bar's +99.x% move beats all 100 prior returns
    assert(got.last._1.contains(100.0))
    assert(got.last._2.nonEmpty)
    // composite = mean of components, all in [0, 100]
    got.flatMap(_._2).foreach(v => assert(v >= 0.0 && v <= 100.0))
  }

  test("fertility: known texts pin the word/subword counts and ratio") {
    val docs = Seq(
      (1L, "Hello world", "en"),
      (2L, "a-b c7d", "en"),
      (3L, "", "und"))
      .toDF("doc_id", "text", "lang")
    val got = Breadth34.fertility(docs)
      .orderBy("doc_id")
      .select("n_words", "n_subwords", "fertility")
      .as[(Long, Long, Option[Double])].collect().toSeq
    // "hello world" -> 2 words, 2 subwords
    assert(got(0) === ((2L, 2L, Some(1.0))))
    // "a-b c7d" -> 2 words; subwords: a,-,b,c,7,d = 6
    assert(got(1) === ((2L, 6L, Some(3.0))))
    // empty text: split yields one empty token; no subwords
    assert(got(2) === ((1L, 0L, Some(0.0))))
  }
}
