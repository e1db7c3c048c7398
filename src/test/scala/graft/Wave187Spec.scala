package graft

import graft.queries.Breadth178
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the hundred-seventy-ninth wave
  * (Breadth178 Good–Turing / RBO / LSH power / sequential patterns). */
class Wave187Spec extends SparkSpec {
  import spark.implicits._

  private def counts(ns: Long*) =
    ns.zipWithIndex.map { case (n, i) => (s"t$i", n) }
      .toDF("sh", "true_n")

  test("goodTuring: r* = (r+1)·N_{r+1}/N_r on a closed-form " +
    "frequency-of-frequencies table; the top frequency gets a NULL " +
    "adjusted count") {
    // counts {1,1,1,2,2,3} -> N1=3, N2=2, N3=1
    val got = Breadth178.goodTuring(counts(1, 1, 1, 2, 2, 3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got === Array(
      (1L, 3L, 2L, Some(2.0 * 2.0 / 3.0)),
      (2L, 2L, 1L, Some(3.0 * 1.0 / 2.0)),
      (3L, 1L, 0L, None)))
  }

  test("unseenMass: P0 = N1/N and hapax share = N1/V exactly") {
    val got = Breadth178.unseenMass(counts(1, 1, 1, 2, 2, 3)).head()
    assert(got.getLong(0) == 10L) // N = 1+1+1+2+2+3
    assert(got.getLong(1) == 6L)  // V
    assert(got.getLong(2) == 3L)  // N1
    assert(got.getDouble(3) == 0.3)
    assert(got.getDouble(4) == 0.5)
  }

  private def ranking(rows: (Long, Int, Long)*) =
    rows.toDF("probe_id", "rank", "neighbor_id")

  test("rbo: identical rank-5 lists score exactly 1.0; disjoint lists " +
    "score 0; a fully reversed list scores the closed-form 210/781") {
    val ex = ranking((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L),
      (1L, 4, 13L), (1L, 5, 14L))
    val same = Breadth178.rbo(ex, ex).head()
    assert(same.getLong(1) == 1L && same.getLong(2) == 5L)
    assert(same.getDouble(3) == 1.0) // sum(t_d)·256/781/1e9 is exactly 1
    val disjoint = Breadth178.rbo(ex,
      ranking((1L, 1, 20L), (1L, 2, 21L), (1L, 3, 22L), (1L, 4, 23L),
        (1L, 5, 24L))).head()
    assert(disjoint.getLong(1) == 0L && disjoint.getLong(2) == 0L)
    assert(disjoint.getDouble(3) == 0.0)
    // reversed: overlaps ov = (0,0,1,3,5) -> rbo = 210/781 exactly
    val rev = Breadth178.rbo(ex,
      ranking((1L, 1, 14L), (1L, 2, 13L), (1L, 3, 12L), (1L, 4, 11L),
        (1L, 5, 10L))).head()
    assert(rev.getDouble(3) == 210.0 / 781.0)
  }

  test("lshPower: the S-curve at s = 0.5 is the exact dyadic " +
    "1 - (1 - 1/8)^4 and the histogram buckets the pair sample") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // exact dup of 1 -> jaccard 1.0
      (3L, "zeta eta theta iota"))
      .toDF("doc_id", "text")
    val got = Breadth178.lshPower(docs).collect()
    assert(got.length == 20)
    val k10 = got.find(_.getInt(0) == 10).get
    assert(k10.getDouble(3) ==
      1.0 - 0.875 * 0.875 * 0.875 * 0.875) // dyadic-exact product chain
    // the duplicate pair (j = 1.0) lands in the clamped top bucket
    val k19 = got.find(_.getInt(0) == 19).get
    assert(k19.getLong(2) == 1L)
    assert(got.map(_.getLong(2)).sum == 1L) // only one pair >= 0.03
  }

  test("seqPatterns: subsequence support with gaps, adjacent tokens " +
    "match through the per-token delimiters, apriori keeps exactly the " +
    "closed-form frequent set") {
    def ev(uid: Long, seq: String*) = seq.zipWithIndex.map { case (t, i) =>
      (uid * 100 + i, java.sql.Timestamp.valueOf(f"2024-01-01 10:0$i%d:00"),
        uid, t, 1.0, "{}")
    }
    val e = (ev(1L, "a", "b", "c") ++ ev(2L, "a", "c", "b") ++
      ev(3L, "b", "a", "c"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val got = Breadth178.seqPatterns(e)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // support >= 10% of 3 users -> every occurring pattern survives
    assert(got.toSeq === Seq(
      ("a", 1, 3L), ("b", 1, 3L), ("c", 1, 3L),
      ("a>c", 2, 3L), ("a>b", 2, 2L), ("b>c", 2, 2L),
      ("b>a", 2, 1L), ("c>b", 2, 1L),
      ("a>b>c", 3, 1L), ("a>c>b", 3, 1L), ("b>a>c", 3, 1L)))
  }
}
