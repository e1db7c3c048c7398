package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2 parity +
  * breadth + the training-data extension ops); `oracleSql` holds the
  * DuckDB-ANSI twin of every SQL-expressible query. Queries without an
  * oracle entry (LSH ANN) get the driver's rows-only check and are
  * covered by ScalaTest instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's signature latest-per-key snapshot (api/server.js:67-77). */
  def entry(spark: SparkSession): DataFrame =
    Parity.defs("q_latest")(spark, "/root/testdata/sf0.001")

  // One wave object per entry; kept as a flat Seq (not a ++ chain) so the
  // scalac typer stack stays bounded as the surface grows.
  private val waves: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (Parity.defs, Parity.oracle),
    (Breadth.defs, Breadth.oracle), (Breadth2.defs, Breadth2.oracle),
    (Breadth3.defs, Breadth3.oracle), (Breadth4.defs, Breadth4.oracle),
    (Breadth5.defs, Breadth5.oracle), (Breadth6.defs, Breadth6.oracle),
    (Breadth7.defs, Breadth7.oracle), (Breadth8.defs, Breadth8.oracle),
    (Breadth9.defs, Breadth9.oracle), (Breadth10.defs, Breadth10.oracle),
    (Breadth11.defs, Breadth11.oracle), (Breadth12.defs, Breadth12.oracle),
    (Breadth13.defs, Breadth13.oracle), (Breadth14.defs, Breadth14.oracle),
    (Breadth15.defs, Breadth15.oracle), (Breadth16.defs, Breadth16.oracle),
    (Breadth17.defs, Breadth17.oracle), (Breadth18.defs, Breadth18.oracle),
    (Breadth19.defs, Breadth19.oracle), (Breadth20.defs, Breadth20.oracle),
    (Breadth21.defs, Breadth21.oracle), (Breadth22.defs, Breadth22.oracle),
    (Breadth23.defs, Breadth23.oracle), (Breadth24.defs, Breadth24.oracle),
    (Breadth25.defs, Breadth25.oracle), (Breadth26.defs, Breadth26.oracle),
    (Breadth27.defs, Breadth27.oracle), (Breadth28.defs, Breadth28.oracle),
    (Breadth29.defs, Breadth29.oracle), (Breadth30.defs, Breadth30.oracle),
    (Breadth31.defs, Breadth31.oracle), (Breadth32.defs, Breadth32.oracle),
    (Breadth33.defs, Breadth33.oracle), (Breadth34.defs, Breadth34.oracle),
    (Breadth35.defs, Breadth35.oracle), (Breadth36.defs, Breadth36.oracle),
    (Breadth37.defs, Breadth37.oracle), (Breadth38.defs, Breadth38.oracle),
    (Breadth39.defs, Breadth39.oracle), (Breadth40.defs, Breadth40.oracle),
    (Breadth41.defs, Breadth41.oracle), (Breadth42.defs, Breadth42.oracle),
    (Breadth43.defs, Breadth43.oracle), (Breadth44.defs, Breadth44.oracle),
    (Breadth45.defs, Breadth45.oracle), (Breadth46.defs, Breadth46.oracle),
    (Breadth47.defs, Breadth47.oracle), (Breadth48.defs, Breadth48.oracle),
    (Breadth49.defs, Breadth49.oracle), (Breadth50.defs, Breadth50.oracle),
    (Breadth51.defs, Breadth51.oracle), (Breadth52.defs, Breadth52.oracle),
    (Breadth53.defs, Breadth53.oracle), (Breadth54.defs, Breadth54.oracle),
    (Breadth55.defs, Breadth55.oracle), (Breadth56.defs, Breadth56.oracle),
    (Breadth57.defs, Breadth57.oracle), (Breadth58.defs, Breadth58.oracle),
    (Breadth59.defs, Breadth59.oracle), (Breadth60.defs, Breadth60.oracle),
    (Breadth61.defs, Breadth61.oracle), (Breadth62.defs, Breadth62.oracle),
    (Breadth63.defs, Breadth63.oracle), (Breadth64.defs, Breadth64.oracle),
    (Breadth65.defs, Breadth65.oracle), (Breadth66.defs, Breadth66.oracle),
    (Breadth67.defs, Breadth67.oracle), (Breadth68.defs, Breadth68.oracle),
    (Breadth69.defs, Breadth69.oracle), (Breadth70.defs, Breadth70.oracle),
    (Breadth71.defs, Breadth71.oracle), (Breadth72.defs, Breadth72.oracle),
    (Breadth73.defs, Breadth73.oracle), (Breadth74.defs, Breadth74.oracle),
    (Breadth75.defs, Breadth75.oracle), (Breadth76.defs, Breadth76.oracle),
    (Breadth77.defs, Breadth77.oracle), (Breadth78.defs, Breadth78.oracle),
    (Breadth79.defs, Breadth79.oracle), (Breadth80.defs, Breadth80.oracle),
    (Breadth81.defs, Breadth81.oracle), (Breadth82.defs, Breadth82.oracle),
    (Breadth83.defs, Breadth83.oracle), (Breadth84.defs, Breadth84.oracle),
    (Breadth85.defs, Breadth85.oracle), (Breadth86.defs, Breadth86.oracle),
    (Breadth87.defs, Breadth87.oracle), (Breadth88.defs, Breadth88.oracle),
    (Breadth89.defs, Breadth89.oracle), (Breadth90.defs, Breadth90.oracle),
    (Breadth91.defs, Breadth91.oracle), (Breadth92.defs, Breadth92.oracle),
    (Breadth93.defs, Breadth93.oracle), (Breadth94.defs, Breadth94.oracle),
    (Breadth95.defs, Breadth95.oracle), (Breadth96.defs, Breadth96.oracle),
    (Breadth97.defs, Breadth97.oracle), (Breadth98.defs, Breadth98.oracle),
    (Breadth99.defs, Breadth99.oracle),
    (Breadth100.defs, Breadth100.oracle),
    (Breadth101.defs, Breadth101.oracle),
    (Breadth102.defs, Breadth102.oracle),
    (Breadth103.defs, Breadth103.oracle),
    (Breadth104.defs, Breadth104.oracle),
    (Breadth105.defs, Breadth105.oracle),
    (Breadth106.defs, Breadth106.oracle),
    (Breadth107.defs, Breadth107.oracle),
    (Breadth108.defs, Breadth108.oracle),
    (Breadth109.defs, Breadth109.oracle),
    (Breadth110.defs, Breadth110.oracle),
    (Breadth111.defs, Breadth111.oracle),
    (Breadth112.defs, Breadth112.oracle),
    (Breadth113.defs, Breadth113.oracle),
    (Breadth114.defs, Breadth114.oracle),
    (Breadth115.defs, Breadth115.oracle),
    (Breadth116.defs, Breadth116.oracle),
    (Breadth117.defs, Breadth117.oracle),
    (Breadth118.defs, Breadth118.oracle),
    (Breadth119.defs, Breadth119.oracle),
    (Breadth120.defs, Breadth120.oracle),
    (Breadth121.defs, Breadth121.oracle),
    (Breadth122.defs, Breadth122.oracle),
    (Breadth123.defs, Breadth123.oracle),
    (Breadth124.defs, Breadth124.oracle),
    (Breadth125.defs, Breadth125.oracle),
    (Breadth126.defs, Breadth126.oracle),
    (Breadth127.defs, Breadth127.oracle),
    (Breadth128.defs, Breadth128.oracle),
    (Breadth129.defs, Breadth129.oracle),
    (Breadth130.defs, Breadth130.oracle),
    (Breadth131.defs, Breadth131.oracle),
    (Breadth132.defs, Breadth132.oracle),
    (Breadth133.defs, Breadth133.oracle),
    (Breadth134.defs, Breadth134.oracle),
    (Breadth135.defs, Breadth135.oracle),
    (Breadth136.defs, Breadth136.oracle),
    (Breadth137.defs, Breadth137.oracle),
    (Breadth138.defs, Breadth138.oracle),
    (Breadth139.defs, Breadth139.oracle),
    (Breadth140.defs, Breadth140.oracle),
    (Breadth141.defs, Breadth141.oracle),
    (Breadth142.defs, Breadth142.oracle),
    (Breadth143.defs, Breadth143.oracle),
    (Breadth144.defs, Breadth144.oracle),
    (Breadth145.defs, Breadth145.oracle),
    (Breadth146.defs, Breadth146.oracle),
    (Breadth147.defs, Breadth147.oracle),
    (Breadth148.defs, Breadth148.oracle),
    (Breadth149.defs, Breadth149.oracle),
    (Breadth150.defs, Breadth150.oracle),
    (Breadth151.defs, Breadth151.oracle),
    (Breadth152.defs, Breadth152.oracle),
    (Breadth153.defs, Breadth153.oracle),
    (Breadth154.defs, Breadth154.oracle),
    (Breadth155.defs, Breadth155.oracle),
    (Breadth156.defs, Breadth156.oracle),
    (Breadth157.defs, Breadth157.oracle),
    (Breadth158.defs, Breadth158.oracle),
    (Breadth159.defs, Breadth159.oracle),
    (Breadth160.defs, Breadth160.oracle),
    (Breadth161.defs, Breadth161.oracle),
    (Breadth162.defs, Breadth162.oracle),
    (Breadth163.defs, Breadth163.oracle),
    (Breadth164.defs, Breadth164.oracle),
    (Breadth165.defs, Breadth165.oracle),
    (Breadth166.defs, Breadth166.oracle),
    (Breadth167.defs, Breadth167.oracle),
    (Breadth168.defs, Breadth168.oracle),
    (Breadth169.defs, Breadth169.oracle),
    (Breadth170.defs, Breadth170.oracle),
    (Breadth171.defs, Breadth171.oracle),
    (Breadth172.defs, Breadth172.oracle),
    (Breadth173.defs, Breadth173.oracle),
    (Breadth174.defs, Breadth174.oracle),
    (Breadth175.defs, Breadth175.oracle),
    (Extensions.defs, Extensions.oracle),
    (Extensions2.defs, Extensions2.oracle),
    (Extensions3.defs, Extensions3.oracle),
    (Extensions4.defs, Extensions4.oracle),
    (Extensions5.defs, Extensions5.oracle),
    (Extensions6.defs, Extensions6.oracle),
    (Extensions7.defs, Extensions7.oracle),
    (Extensions8.defs, Extensions8.oracle),
    (Extensions9.defs, Extensions9.oracle),
    (Extensions10.defs, Extensions10.oracle),
    (Extensions11.defs, Extensions11.oracle),
    (Extensions12.defs, Extensions12.oracle),
    (Stores.defs, Stores.oracle),
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    waves.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    waves.iterator.map(_._2).reduce(_ ++ _)
}
