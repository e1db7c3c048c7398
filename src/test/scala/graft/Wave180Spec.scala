package graft

import graft.queries.Breadth171
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-seventy-second wave (Breadth171 isotonic
  * calibration). */
class Wave180Spec extends SparkSpec {
  import spark.implicits._

  test("isotonic fit is monotone, brackets the data, and preserves " +
    "the weighted total") {
    val d = Tables.documents(spark, sf0001)
    val t = Breadth171.isotonicCalibration(d).collect()
    assert(t.nonEmpty)
    val iso = t.map(_.getAs[Double]("iso_rate"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b + 1e-15 })
    iso.foreach(v => assert(v >= 0.0 && v <= 1.0))
    // PAVA preserves the weighted mean: sum n*iso == sum pos
    val total = t.map(r =>
      r.getAs[Long]("n") * r.getAs[Double]("iso_rate")).sum
    val pos = t.map(_.getAs[Long]("pos")).sum
    assert(math.abs(total - pos) < 1e-6 * pos)
  }

  test("isotonic equals a driver-side PAVA") {
    val d = Tables.documents(spark, sf0001)
    val t = Breadth171.isotonicCalibration(d).collect()
      .sortBy(_.getAs[Long]("bin"))
    // classic pool-adjacent-violators on (pos, n) blocks
    case class Blk(var pos: Long, var n: Long)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Blk]
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    t.foreach { r =>
      blocks += Blk(r.getAs[Long]("pos"), r.getAs[Long]("n"))
      sizes += 1
      while (blocks.length > 1 && {
        val a = blocks(blocks.length - 2); val b = blocks.last
        a.pos.toDouble * b.n >= b.pos.toDouble * a.n // a.avg >= b.avg
      }) {
        val b = blocks.remove(blocks.length - 1)
        val s = sizes.remove(sizes.length - 1)
        blocks.last.pos += b.pos; blocks.last.n += b.n
        sizes(sizes.length - 1) += s
      }
    }
    val pava = blocks.zip(sizes).flatMap { case (b, s) =>
      Seq.fill(s)(b.pos.toDouble / b.n.toDouble)
    }
    t.map(_.getAs[Double]("iso_rate")).zip(pava).foreach {
      case (got, want) => assert(math.abs(got - want) < 1e-12)
    }
  }

  test("ECE never worsens under isotonic fitting on violating data") {
    val d = Tables.documents(spark, sf0001)
    val e = Breadth171.calibrationError(d).collect()(0)
    val raw = e.getAs[Double]("ece_raw")
    val iso = e.getAs[Double]("ece_iso")
    assert(raw >= 0.0 && iso >= 0.0)
    // p is independent of y here: raw rates oscillate around the base
    // rate while mean_p ramps 0..1 -> isotonic pooling helps
    if (e.getAs[Long]("violations_raw") > 0) {
      assert(iso <= raw + 1e-9)
    }
  }

  test("already-monotone data is a fixed point of the fit") {
    // build bins whose empirical rates already increase
    val rows = (0 until 1000).map { i =>
      val nc = i % 101
      val p = nc / 101.0
      // lang 'en' iff a deterministic threshold under p: rate grows
      val en = (i * 7 % 100) < (p * 100).toInt
      (i.toLong, s"t$i", if (en) "en" else "fr", "web", nc.toLong)
    }
    import spark.implicits._
    val d = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val t = Breadth171.isotonicCalibration(d).collect()
      .sortBy(_.getAs[Long]("bin"))
    val raw = t.map(_.getAs[Double]("pos_rate"))
    val isMonotone = raw.zip(raw.tail).forall { case (a, b) => a <= b }
    if (isMonotone) {
      t.foreach(r => assert(
        math.abs(r.getAs[Double]("iso_rate") -
          r.getAs[Double]("pos_rate")) < 1e-12))
    } else {
      // still a valid monotone fit
      val iso = t.map(_.getAs[Double]("iso_rate"))
      assert(iso.zip(iso.tail).forall { case (a, b) => a <= b + 1e-15 })
    }
  }
}
