import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** Shape of every declared operator: (session, sfDir) => result. */
  type Q = (SparkSession, String) => DataFrame
}
