import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** A named query in the driver contract: (session, sf-dir) => result. */
  type Q = (SparkSession, String) => DataFrame
}
