package graft

import graft.queries.{Breadth, Breadth2, Breadth3, Breadth4, Breadth5, Breadth6, Breadth7, Breadth8, Breadth9, Breadth10, Breadth11, Breadth12, Breadth13, Breadth14, Breadth15, Breadth16, Breadth17, Breadth18, Breadth19, Breadth20, Breadth21, Breadth22, Breadth23, Breadth24, Breadth25, Breadth26, Breadth27, Breadth28, Breadth29, Breadth30, Breadth31, Breadth32, Breadth33, Breadth34, Breadth35, Breadth36, Breadth37, Breadth38, Breadth39, Breadth40, Breadth41, Breadth42, Breadth43, Breadth44, Breadth45, Breadth46, Breadth47, Breadth48, Breadth49, Breadth50, Breadth51, Breadth52, Breadth53, Breadth54, Breadth55, Breadth56, Breadth57, Breadth58, Breadth59, Breadth60, Breadth61, Breadth62, Breadth63, Breadth64, Breadth65, Breadth66, Breadth67, Breadth68, Breadth69, Breadth70, Breadth71, Breadth72, Breadth73, Breadth74, Breadth75, Breadth76, Breadth77, Breadth78, Breadth79, Breadth80, Breadth81, Breadth82, Breadth83, Breadth84, Breadth85, Breadth86, Breadth87, Breadth88, Breadth89, Breadth90, Breadth91, Breadth92, Breadth93, Extensions, Extensions2, Extensions3, Extensions4, Extensions5, Extensions6, Extensions7, Extensions8, Extensions9, Extensions10, Extensions11, Extensions12, Parity, Stores}
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

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Parity.defs ++ Breadth.defs ++ Breadth2.defs ++ Breadth3.defs ++ Breadth4.defs ++
      Breadth5.defs ++ Breadth6.defs ++ Breadth7.defs ++ Breadth8.defs ++ Breadth9.defs ++
      Breadth10.defs ++ Breadth11.defs ++ Breadth12.defs ++ Breadth13.defs ++ Breadth14.defs ++ Breadth15.defs ++ Breadth16.defs ++ Breadth17.defs ++ Breadth18.defs ++ Breadth19.defs ++ Breadth20.defs ++ Breadth21.defs ++ Breadth22.defs ++ Breadth23.defs ++ Breadth24.defs ++ Breadth25.defs ++ Breadth26.defs ++ Breadth27.defs ++ Breadth28.defs ++ Breadth29.defs ++ Breadth30.defs ++ Breadth31.defs ++ Breadth32.defs ++ Breadth33.defs ++ Breadth34.defs ++ Breadth35.defs ++ Breadth36.defs ++ Breadth37.defs ++ Breadth38.defs ++ Breadth39.defs ++ Breadth40.defs ++ Breadth41.defs ++ Breadth42.defs ++ Breadth43.defs ++ Breadth44.defs ++ Breadth45.defs ++ Breadth46.defs ++ Breadth47.defs ++ Breadth48.defs ++ Breadth49.defs ++ Breadth50.defs ++ Breadth51.defs ++ Breadth52.defs ++ Breadth53.defs ++ Breadth54.defs ++ Breadth55.defs ++ Breadth56.defs ++ Breadth57.defs ++ Breadth58.defs ++ Breadth59.defs ++ Breadth60.defs ++ Breadth61.defs ++ Breadth62.defs ++ Breadth63.defs ++ Breadth64.defs ++ Breadth65.defs ++ Breadth66.defs ++ Breadth67.defs ++ Breadth68.defs ++ Breadth69.defs ++ Breadth70.defs ++ Breadth71.defs ++ Breadth72.defs ++ Breadth73.defs ++ Breadth74.defs ++ Breadth75.defs ++ Breadth76.defs ++ Breadth77.defs ++ Breadth78.defs ++ Breadth79.defs ++ Breadth80.defs ++ Breadth81.defs ++ Breadth82.defs ++ Breadth83.defs ++ Breadth84.defs ++ Breadth85.defs ++ Breadth86.defs ++ Breadth87.defs ++ Breadth88.defs ++ Breadth89.defs ++ Breadth90.defs ++ Breadth91.defs ++ Breadth92.defs ++ Breadth93.defs ++
      Extensions.defs ++ Extensions2.defs ++ Extensions3.defs ++ Extensions4.defs ++
      Extensions5.defs ++ Extensions6.defs ++ Extensions7.defs ++ Extensions8.defs ++
      Extensions9.defs ++ Extensions10.defs ++ Extensions11.defs ++ Extensions12.defs ++ Stores.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Parity.oracle ++ Breadth.oracle ++ Breadth2.oracle ++ Breadth3.oracle ++ Breadth4.oracle ++
      Breadth5.oracle ++ Breadth6.oracle ++ Breadth7.oracle ++ Breadth8.oracle ++ Breadth9.oracle ++
      Breadth10.oracle ++ Breadth11.oracle ++ Breadth12.oracle ++ Breadth13.oracle ++ Breadth14.oracle ++ Breadth15.oracle ++ Breadth16.oracle ++ Breadth17.oracle ++ Breadth18.oracle ++ Breadth19.oracle ++ Breadth20.oracle ++ Breadth21.oracle ++ Breadth22.oracle ++ Breadth23.oracle ++ Breadth24.oracle ++ Breadth25.oracle ++ Breadth26.oracle ++ Breadth27.oracle ++ Breadth28.oracle ++ Breadth29.oracle ++ Breadth30.oracle ++ Breadth31.oracle ++ Breadth32.oracle ++ Breadth33.oracle ++ Breadth34.oracle ++ Breadth35.oracle ++ Breadth36.oracle ++ Breadth37.oracle ++ Breadth38.oracle ++ Breadth39.oracle ++ Breadth40.oracle ++ Breadth41.oracle ++ Breadth42.oracle ++ Breadth43.oracle ++ Breadth44.oracle ++ Breadth45.oracle ++ Breadth46.oracle ++ Breadth47.oracle ++ Breadth48.oracle ++ Breadth49.oracle ++ Breadth50.oracle ++ Breadth51.oracle ++ Breadth52.oracle ++ Breadth53.oracle ++ Breadth54.oracle ++ Breadth55.oracle ++ Breadth56.oracle ++ Breadth57.oracle ++ Breadth58.oracle ++ Breadth59.oracle ++ Breadth60.oracle ++ Breadth61.oracle ++ Breadth62.oracle ++ Breadth63.oracle ++ Breadth64.oracle ++ Breadth65.oracle ++ Breadth66.oracle ++ Breadth67.oracle ++ Breadth68.oracle ++ Breadth69.oracle ++ Breadth70.oracle ++ Breadth71.oracle ++ Breadth72.oracle ++ Breadth73.oracle ++ Breadth74.oracle ++ Breadth75.oracle ++ Breadth76.oracle ++ Breadth77.oracle ++ Breadth78.oracle ++ Breadth79.oracle ++ Breadth80.oracle ++ Breadth81.oracle ++ Breadth82.oracle ++ Breadth83.oracle ++ Breadth84.oracle ++ Breadth85.oracle ++ Breadth86.oracle ++ Breadth87.oracle ++ Breadth88.oracle ++ Breadth89.oracle ++ Breadth90.oracle ++ Breadth91.oracle ++ Breadth92.oracle ++ Breadth93.oracle ++
      Extensions.oracle ++ Extensions2.oracle ++ Extensions3.oracle ++ Extensions4.oracle ++
      Extensions5.oracle ++ Extensions6.oracle ++ Extensions7.oracle ++ Extensions8.oracle ++
      Extensions9.oracle ++ Extensions10.oracle ++ Extensions11.oracle ++ Extensions12.oracle ++ Stores.oracle
}
