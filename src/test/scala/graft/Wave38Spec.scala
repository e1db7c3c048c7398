package graft

import graft.queries.Breadth38
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the thirty-eighth wave (Breadth38 EMV +
  * vocabulary growth). */
class Wave38Spec extends SparkSpec {
  import spark.implicits._

  private def day(i: Int) =
    java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1).toString + " 10:00:00"

  /** Two ticks per day with a volume prop: (low, high, vol). */
  private def lhvSeries(bars: Seq[(Long, Long, Long)], key: Long = 1L) =
    bars.zipWithIndex.flatMap { case ((lo, hi, v), i) =>
      Seq((key, lo.toDouble / 100.0, i.toLong * 2 + 1, day(i + 1), v),
        (key, hi.toDouble / 100.0, i.toLong * 2 + 2, day(i + 1), 0L))
    }.toDF("user_id", "value", "event_id", "at", "k")
      .withColumn("ts", to_timestamp_ntz(col("at"))).drop("at")
      .withColumn("props", concat(lit("{\"k\":"), col("k"), lit("}")))
      .drop("k")

  test("emv: constant-range bars marching up at a fixed stride with " +
    "constant volume pin the aggregate ratio exactly") {
    // bar i: [1000+20i, 1100+20i], vol 50/day (50+0 per the two ticks)
    // mm = 40 (2·20 stride), range = 100 -> num = 4000; den = 50
    // window: Σnum/Σden = (14·4000)/(14·50) = 80
    val bars = (0 until 18).map(i => (1000L + i * 20, 1100L + i * 20, 50L))
    val got = Breadth38.emv(lhvSeries(bars),
      "user_id", "ts", "value", "event_id", "k")
      .orderBy("day").select("emv").as[Option[Double]].collect().toSeq
    assert(got.size === 18 - 1 - 13) // 17 diff bars − 13 window warm-up
    assert(got.forall(_.contains(80.0)))
  }

  test("vocabGrowth: a corpus whose docs introduce known token sets " +
    "pins every decile count; the curve is monotone and ends at the " +
    "full vocabulary") {
    // 10 docs; doc i introduces exactly one new token beyond shared 'x'
    val docs = (1 to 10).map(i => (i.toLong, s"x tok$i")).toDF("doc_id", "text")
    val got = Breadth38.vocabGrowth(docs)
      .orderBy("decile")
      .select("decile", "n_docs_prefix", "vocab_size", "new_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.size === 10)
    // prefix k holds docs 1..k: vocab = k new tokens + the shared 'x'
    got.foreach { case (k, np, vs, nt) =>
      assert(np === k)
      assert(vs === k + 1)
      assert(nt === (if (k == 1) 2L else 1L))
    }
    // monotone, final = full vocab
    assert(got.last._3 === 11L)
  }
}
