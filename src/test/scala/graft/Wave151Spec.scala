package graft

import graft.queries.Breadth143
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-forty-fourth wave (Breadth143 margin-based
  * bitext mining). */
class Wave151Spec extends SparkSpec {
  import spark.implicits._

  private def pad(v: Seq[Float]): Array[Float] =
    (v ++ Seq.fill(64 - v.length)(0.0f)).toArray

  // en shore ids 1-4 along axes e1..e4; de shore ids 11-14 slightly
  // rotated copies: the true pairing is i <-> 10+i.
  private def fixture() = {
    val en = (1 to 4).map { i =>
      (i.toLong, pad(Seq.tabulate(6)(j => if (j == i - 1) 1.0f else 0.0f)))
    }
    val de = (1 to 4).map { i =>
      (10L + i, pad(Seq.tabulate(6)(j =>
        if (j == i - 1) 0.9f else if (j == 5) 0.1f else 0.0f)))
    }
    val emb = (en ++ de).map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
    val docs = ((1 to 4).map(i => (i.toLong, "en")) ++
      (1 to 4).map(i => (10L + i, "de")))
      .toDF("doc_id", "lang")
      .withColumn("text", lit("x")).withColumn("source", lit("s"))
      .withColumn("n_chars", lit(1L))
    (emb, docs)
  }

  test("orthogonal translation pairs mine mutually with margin > 1") {
    val (emb, docs) = fixture()
    val got = Breadth143.bitextMine(emb, docs).collect()
    assert(got.map(r => r.getAs[Long]("id_en") -> r.getAs[Long]("id_de"))
      .toSeq == (1 to 4).map(i => i.toLong -> (10L + i)))
    got.foreach { r =>
      assert(r.getAs[Double]("margin") > 1.0,
        "a true pair's cosine beats its neighbourhood average")
      assert(r.getAs[Double]("cos") > 0.98)
    }
  }

  test("margin table ranks all forward matches, top rank is a mutual " +
    "pair, ranks are 1..n") {
    val (emb, docs) = fixture()
    val got = Breadth143.bitextMargin(emb, docs).collect()
    assert(got.map(_.getAs[Long]("rank")).toSeq ==
      (1L to got.length.toLong))
    val mined = Breadth143.bitextMine(emb, docs).collect()
      .map(r => r.getAs[Long]("id_en") -> r.getAs[Long]("id_de")).toSet
    assert(mined.contains(got.head.getAs[Long]("id_en")
      -> got.head.getAs[Long]("id_de")))
  }

  test("sf0.001: mutual pairs are consistent with the margin table " +
    "and margins are positive") {
    val emb = Tables.embeddings(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
    val mined = Breadth143.bitextMine(emb, docs).collect()
    assert(mined.nonEmpty, "some mutual best matches exist")
    val enIds = mined.map(_.getAs[Long]("id_en")).toSeq
    assert(enIds.distinct.length == enIds.length,
      "each en vector mines at most one pair")
    mined.foreach(r => assert(r.getAs[Double]("margin") > 0.0))
  }
}
