package graft

import graft.queries.Breadth83
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the eighty-fourth wave (Breadth83 interval
  * sweep: coverage, gaps, concurrency). */
class Wave86Spec extends SparkSpec {
  import spark.implicits._

  private def li(rows: Seq[(Long, String)]) =
    rows.toDF("l_suppkey", "at")
      .withColumn("l_shipdate", to_timestamp_ntz(col("at"))).drop("at")

  // ships on days 0, 3 (windows merge into [0,9]) and 20 ([20,26])
  private val fixture = li(Seq(
    (1L, "1995-01-01"), (1L, "1995-01-04"), (1L, "1995-01-21")))

  test("shipCoverage: overlapping windows merge; disjoint ones count " +
    "as separate islands with exact day totals") {
    val got = Breadth83.shipCoverage(fixture)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq((1L, 2L, 17L, 10L)))
  }

  test("shipGaps: one gap of exactly the uncovered days between islands") {
    val got = Breadth83.shipGaps(fixture)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // islands [0,9] and [20,26] -> gap days 10..19 = 10
    assert(got === Seq((1L, 1L, 10L, 10L)))
  }

  test("shipGaps: a single-island supplier reports zero gaps and null " +
    "idle days") {
    val got = Breadth83.shipGaps(li(Seq((7L, "1995-01-01"))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2),
        r.isNullAt(3))).toSeq
    assert(got === Seq((7L, 0L, true, true)))
  }

  test("duplicate intervals are deduped before the island build (round " +
    "14 tie-safety): heavy duplicates produce identical coverage under " +
    "every physical input order, equal to the duplicate-free run") {
    // the flake class this pins: with duplicate (key, s, e) rows, the
    // island-label running sum rode a non-total (s, e) order and a
    // duplicate could inherit the previous island's label — coverage
    // then shifted by a few days, nondeterministically, in whichever
    // engine's parallel window happened to reorder the ties
    val days = Seq("1995-01-01", "1995-01-04", "1995-01-21", "1995-02-05")
    val dups = for { d <- days; _ <- 1 to 7 } yield (1L, d)
    val clean = Breadth83.shipCoverage(li(days.map(d => (1L, d))))
      .collect().map(_.toSeq).toSeq
    // fixed-seed shuffle (ADVICE, round 14): an unseeded permutation made
    // a hypothetical failure unreproducible from the failure message
    Seq(li(dups), li(dups.reverse), li(new scala.util.Random(14).shuffle(dups)),
      li(dups).repartition(7), li(dups).repartition(3)).foreach { in =>
      assert(Breadth83.shipCoverage(in).collect().map(_.toSeq).toSeq ==
        clean, "coverage must be order- and multiplicity-invariant")
    }
    val cleanGaps = Breadth83.shipGaps(li(days.map(d => (1L, d))))
      .collect().map(_.toSeq).toSeq
    assert(Breadth83.shipGaps(li(dups).repartition(5))
      .collect().map(_.toSeq).toSeq == cleanGaps)
  }

  test("orderConcurrency: 30-day half-open spans peak where two orders " +
    "overlap, first peak day emitted") {
    val nation = Seq((1, "ALGERIA")).toDF("n_nationkey", "n_name")
    val customer = Seq((1L, 1), (2L, 1)).toDF("c_custkey", "c_nationkey")
    val orders = Seq(
      (10L, 1L, "1995-01-01"), // day 0  -> [0,30)
      (11L, 2L, "1995-01-11"), // day 10 -> [10,40): overlap -> level 2
      (12L, 1L, "1995-02-20")) // day 50 -> [50,80)
      .toDF("o_orderkey", "o_custkey", "at")
      .withColumn("o_orderdate", to_timestamp_ntz(col("at"))).drop("at")
    val got = Breadth83.orderConcurrency(nation, customer, orders)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDate(3).toString)).toSeq
    assert(got === Seq(("ALGERIA", 3L, 2L, "1995-01-11")))
  }
}
