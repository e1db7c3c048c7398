package graft

import graft.queries.Breadth117

/** Fixtures for the hundred-eighteenth wave (Breadth117 HITS + BFS hop
  * histogram). */
class Wave123Spec extends SparkSpec {
  import spark.implicits._

  test("hits: the denser supplier hubs, the shared part is the " +
    "authority, L1 mass stays within SCALE") {
    // s1 supplies p1+p2, s2 supplies p1 only → p1 is the authority
    // (fed by both hubs), s1 the stronger hub (touches both parts).
    val edges = Seq((1L, 101L), (1L, 102L), (2L, 101L))
      .toDF("src", "dst")
    val rows = Breadth117.hits(edges).collect()
    val auth = rows.filter(_.getString(0) == "authority")
    val hubs = rows.filter(_.getString(0) == "hub")
    assert(auth.head.getLong(1) === 101L)
    assert(auth.map(_.getLong(2)).head > auth.map(_.getLong(2)).last)
    assert(hubs.head.getLong(1) === 1L)
    // floor-division L1 normalization: each side's mass never exceeds
    // SCALE (floor losses only shrink it)
    assert(auth.map(_.getLong(2)).sum <= Breadth117.HitsScale)
    assert(hubs.map(_.getLong(2)).sum <= Breadth117.HitsScale)
  }

  test("hits int64 guard: a 10⁷-source edge set with one hot authority " +
    "stays positive and L1-bounded at scale 2³¹ (the uniform seed would " +
    "wrap ra·scale past 2⁶³ at indeg 9.5·10⁶)") {
    import org.apache.spark.sql.functions._
    // The production setting for |S| = 10⁷ sources: scale ≥ |S| for
    // floor-normalization granularity (at scale 10⁶ every one of 10⁷
    // hubs floors to 0 mass and the next normalizer divides by zero),
    // scale ≤ ~3·10⁹ for the scale² product headroom. 2³¹ sits in the
    // window. With the uniform seed the hot authority's normalizer
    // product would be 9.5e6·2³¹·2³¹ ≈ 4.4e25 — wrapped long ago; the
    // max(1, scale div |S|) seed caps it at scale² ≈ 4.6e18 < 2⁶³.
    val scale = 1L << 31
    val n = 10000000L
    val edges = spark.range(n).select(col("id").as("src"),
      when(col("id") < 9500000L, 0L).otherwise(col("id") % 5 + 1).as("dst"))
    assert(BigInt(9500000L) * BigInt(scale) * BigInt(scale) >
      BigInt(Long.MaxValue))
    assert(BigInt(scale) * BigInt(scale) < BigInt(Long.MaxValue))
    val rows = Breadth117.hits(edges, scale = scale).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = r.getLong(2)
      assert(score >= 0 && score <= scale, s"score out of [0, scale]: $r")
    }
    val topAuth = rows.filter(_.getString(0) == "authority").head
    assert(topAuth.getLong(1) == 0L, s"hot authority must rank first: $topAuth")
    assert(topAuth.getLong(2) > 0L)
  }

  test("hits scale parameter: a hot authority at scale 2³¹ (where the " +
    "uniform seed wraps at indeg 20) keeps exact bounded scores") {
    val scale = 1L << 31
    val edges = (0L until 20L).map(s => (s, 0L)) ++
      Seq((0L, 1L), (1L, 2L))
    val rows = Breadth117.hits(edges.toDF("src", "dst"), scale = scale)
      .collect()
    assert(BigInt(20L) * BigInt(scale) * BigInt(scale) > BigInt(Long.MaxValue))
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= scale, r.toString)
    }
    assert(rows.filter(_.getString(0) == "authority").head.getLong(1) == 0L)
  }

  test("hits is deterministic: two runs bit-equal") {
    val edges = Seq((1L, 101L), (1L, 102L), (2L, 101L), (3L, 103L),
      (3L, 101L)).toDF("src", "dst")
    val a = Breadth117.hits(edges).collect().map(_.toString)
    val b = Breadth117.hits(edges).collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("hopHistogram: path hops counted per ring, disconnected " +
    "component lands on -1") {
    // path 1-2-3-4-5 (label 0, seed 1) + disconnected edge 6-7 of the
    // SAME label (not a seed → unreached → hop -1)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
      .toDF("id_a", "id_b")
    val labels = (1L to 7L).map(n => (n, 0)).toDF("node", "label")
    val got = Breadth117.hopHistogram(edges, labels).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === Map(-1 -> 2L, 0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 1L,
      4 -> 1L))
  }

  test("hopHistogram: one seed per label, hop-0 count = label count") {
    val edges = Seq((1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Seq((1L, 0), (2L, 0), (10L, 1), (11L, 1))
      .toDF("node", "label")
    val got = Breadth117.hopHistogram(edges, labels).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === Map(-1 -> 0L, 0 -> 2L, 1 -> 2L))
  }
}
