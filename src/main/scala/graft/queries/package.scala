package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** The driver contract: (session, sf directory) → result. */
  type Q = (SparkSession, String) => DataFrame
}
