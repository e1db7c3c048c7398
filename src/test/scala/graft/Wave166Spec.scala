package graft

import graft.queries.{Breadth151, Breadth157}
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-fifty-eighth wave (Breadth157 t-closeness). */
class Wave166Spec extends SparkSpec {
  import spark.implicits._

  // 10 docs, one source, n_chars ordered by doc_id so deciles are
  // doc_id-aligned (10 docs -> one per decile... sz-1 classes). Use 20
  // docs -> 2 per decile for non-trivial classes.
  private def handDocs = {
    // deciles of 20 rows: rows 2i, 2i+1 -> decile i. Make decile 0 all
    // "xx" (globally rare) and the rest alternate en/fr evenly.
    val rows = (0 until 20).map { i =>
      val lang = if (i < 2) "xx" else if (i % 2 == 0) "en" else "fr"
      (i.toLong, s"doc $i", lang, "web", (100 + i).toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("hand corpus: the skewed decile carries the dataset t") {
    // global: xx 2/20, en 9/20, fr 9/20. Decile 0 = {xx, xx}:
    // TVD = 1/2(|1-0.1| + |0-0.45| + |0-0.45|) = 0.9.
    // Other deciles = {en, fr}: TVD = 1/2(|0-0.1| + 2*|0.5-0.45|) = 0.1.
    val tv = Breadth157.classTvd(handDocs).collect()
      .map(r => r.getAs[Long]("len_decile") -> r.getAs[Double]("tvd"))
      .toMap
    assert(tv(0L) == 0.9)
    (1L to 9L).foreach(d => assert(tv(d) == 0.1))
    val row = Breadth157.tCloseness(handDocs).collect()(0)
    assert(row.getAs[Long]("n_classes") == 10L)
    assert(row.getAs[Double]("t_closeness") == 0.9)
    assert(row.getAs[Long]("n_disclosing") == 1L)
    assert(row.getAs[Double]("disclosing_share") == 0.1)
    val worst = Breadth157.tWorstClasses(handDocs).collect()
    assert(worst.head.getAs[Long]("len_decile") == 0L)
    // num = |2*20-2*2| + 2*|0*20-9*2| = 36 + 36 = 72
    assert(worst.head.getAs[Long]("tvd_num") == 72L)
  }

  test("TVD is bounded to [0,1] and zero iff the class matches the " +
    "global distribution") {
    val docs = Tables.documents(spark, sf0001)
    val tv = Breadth157.classTvd(docs).collect()
    assert(tv.nonEmpty)
    tv.foreach { r =>
      val t = r.getAs[Double]("tvd")
      assert(t >= 0.0 && t <= 1.0)
    }
    // brute-force recompute on the driver
    val rows = Breadth151.qiClasses(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("len_decile"),
        r.getAs[String]("lang")))
    val n = rows.length.toLong
    val glob = rows.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val classes = rows.groupBy(r => (r._1, r._2))
    tv.foreach { r =>
      val key = (r.getAs[String]("source"), r.getAs[Long]("len_decile"))
      val members = classes(key)
      val sz = members.length.toLong
      val cv = members.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val num = glob.map { case (lang, gv) =>
        math.abs(cv.getOrElse(lang, 0L) * n - gv * sz)
      }.sum
      assert(r.getAs[Long]("tvd_num") == num, s"class $key")
      assert(r.getAs[Double]("tvd") == num.toDouble / (2L * sz * n).toDouble)
    }
  }

  test("summary row is consistent with the class table") {
    val docs = Tables.documents(spark, sf0001)
    val tv = Breadth157.classTvd(docs).collect()
    val s = Breadth157.tCloseness(docs).collect()(0)
    assert(s.getAs[Long]("n_classes") == tv.length.toLong)
    assert(s.getAs[Double]("t_closeness") ==
      tv.map(_.getAs[Double]("tvd")).max)
    val worst = Breadth157.tWorstClasses(docs).collect()
    assert(worst.length == math.min(10, tv.length))
    assert(worst.head.getAs[Double]("tvd") == s.getAs[Double]("t_closeness"))
    val ts = worst.map(_.getAs[Double]("tvd")).toSeq
    assert(ts.zip(ts.tail).forall { case (a, b) => a >= b })
  }
}
