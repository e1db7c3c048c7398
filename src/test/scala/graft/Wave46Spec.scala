package graft

import graft.queries.Breadth46

/** Closed-form fixtures for the forty-seventh wave (Breadth46 ranking
  * eval). */
class Wave46Spec extends SparkSpec {
  import spark.implicits._

  private def ranking(rows: (Long, Int, Long)*) =
    rows.toDF("probe_id", "rank", "neighbor_id")

  private val exact = ranking((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L),
    (1L, 4, 13L), (1L, 5, 14L))

  test("ndcgAt5: a perfect ranking scores exactly 1; swapping the top " +
    "two costs the hand-computed weight difference") {
    val perfect = Breadth46.ndcgAt5(exact, exact).collect().head
    assert(perfect.getLong(1) === 5L)
    assert(perfect.getLong(2) === Breadth46.IdealDcg)
    assert(perfect.getDouble(3) === 1.0)

    val swapped = ranking((1L, 1, 11L), (1L, 2, 10L), (1L, 3, 12L),
      (1L, 4, 13L), (1L, 5, 14L))
    val got = Breadth46.ndcgAt5(exact, swapped).collect().head
    // pos1 carries gain 4, pos2 carries gain 5, tail unchanged
    val dcg = 4L * 1000000L + 5L * 630930L + 3L * 500000L +
      2L * 430677L + 1L * 386853L
    assert(got.getLong(2) === dcg)
    assert(got.getDouble(3) === dcg.toDouble / Breadth46.IdealDcg.toDouble)
  }

  test("ndcgAt5: a stray neighbour zeroes its position's gain and " +
    "drops the hit count") {
    val oneMiss = ranking((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L),
      (1L, 4, 13L), (1L, 5, 99L))
    val got = Breadth46.ndcgAt5(exact, oneMiss).collect().head
    assert(got.getLong(1) === 4L)
    assert(got.getLong(2) === Breadth46.IdealDcg - 1L * 386853L)
  }

  test("recallCurve: the top-two swap is invisible at k>=2 but halves " +
    "nothing at k=1 — it zeroes it") {
    val swapped = ranking((1L, 1, 11L), (1L, 2, 10L), (1L, 3, 12L),
      (1L, 4, 13L), (1L, 5, 14L))
    val got = Breadth46.recallCurve(exact, swapped)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got === Seq((1L, 0L, 0.0), (2L, 2L, 1.0), (3L, 3L, 1.0),
      (4L, 4L, 1.0), (5L, 5L, 1.0)))
  }
}
