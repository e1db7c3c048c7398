package graft

import graft.queries.{Breadth178, Stores}
import org.apache.spark.sql.functions._

/** Pins for the round-13 hygiene fixes: the derived-store reaper
  * (regenerated testdata used to strand whole `graft_store_*` trees in
  * the JVM temp dir forever) and the pattern-token escape (a LIKE
  * metacharacter or delimiter in an event type used to corrupt both the
  * miner's patterns and the journey screen — invisibly, because the
  * oracle shares the construction). */
class StoreGcSpec extends SparkSpec {
  import spark.implicits._

  private def tmp = new java.io.File(sys.props("java.io.tmpdir"))

  private def mkRoot(name: String, ageDays: Int): java.io.File = {
    val f = new java.io.File(tmp, name)
    f.mkdirs()
    new java.io.File(f, "payload").createNewFile()
    f.setLastModified(System.currentTimeMillis() - ageDays * 86400000L)
    f
  }

  test("reapStaleRoots keeps the 4 newest roots per table, deletes " +
    "older ones and legacy un-tabled roots") {
    val keep = (0 until 4).map(i => mkRoot(s"graft_store_gctest_${i}abc", i))
    val stale = (4 until 7).map(i => mkRoot(s"graft_store_gctest_${i}abc", i))
    val legacy = mkRoot("graft_store_00deadbeef00dead", 1)
    val other = mkRoot("graft_store_othertbl_0abc", 9) // different table
    try {
      Stores.reapStaleRoots("gctest")
      assert(keep.forall(_.exists()), "newest 4 must survive")
      assert(stale.forall(!_.exists()), "older roots must be reaped")
      assert(!legacy.exists(), "legacy fingerprint-only roots must go")
      assert(other.exists(), "other tables' roots are not this reap's business")
    } finally (keep ++ stale ++ Seq(legacy, other))
      .foreach(graft.Fs.deleteRecursively)
  }

  test("store builds survive the reaper: q_partition_stats still reads " +
    "a live store after a reap pass") {
    val df = SparkEntry.queries("q_partition_stats")(spark, sf0001)
    assert(df.count() > 0)
    Stores.reapStaleRoots("events")
    assert(SparkEntry.queries("q_partition_stats")(spark, sf0001).count() > 0)
  }

  test("encodeTok is injective on the five metacharacters and identity " +
    "elsewhere; Scala and Column forms agree") {
    val nasty = Seq("click", "a%b", "a_b", "a|b", "a>b", "a~b", "~t", "%|>_~")
    val enc = nasty.map(Breadth178.encodeTokScala)
    assert(enc.toSet.size == nasty.size, "injective")
    assert(Breadth178.encodeTokScala("click") == "click", "identity on clean tokens")
    assert(enc.forall(e => !e.exists("%_|>".contains(_))),
      "encoded tokens contain no LIKE metachars or delimiters")
    val viaCol = nasty.toDF("t")
      .select(Breadth178.encodeTok(col("t"))).as[String].collect().toSeq
    assert(viaCol == enc, "Column twin must match the Scala twin")
  }

  test("a metacharacter event type no longer corrupts pattern support: " +
    "the miner counts '|'-containing types exactly") {
    // 10 users, each with the same 2-event journey whose first type
    // embeds a token delimiter; un-escaped, '|x|y|' would split into
    // phantom tokens and LIKE-match wrong sequences.
    val rows = (1L to 10L).flatMap { u =>
      Seq((u * 10 + 1, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), u, "x|y", 1.0),
        (u * 10 + 2, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), u, "z", 1.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val got = Breadth178.seqPatterns(rows)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == Set(("x~by", 1, 10L), ("z", 1, 10L), ("x~by>z", 2, 10L)),
      s"got $got")
  }
}
