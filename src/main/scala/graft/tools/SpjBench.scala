package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement: the storage-partitioned planner's payoff over a
  * committed store at scale — point-key aggregation and the drift join
  * with v2 bucketing ON vs OFF, warm reps. Not part of the driver
  * contract. Usage: runMain graft.tools.SpjBench [sfDir] [reps] */
object SpjBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "target/testdata-sf1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // build (or reuse) the uncompacted memoized store via the declared
    // key's own machinery, then address it directly
    graft.SparkEntry.queries("varda_freq_asof")(spark, sfDir).count()
    val dir = graft.ops.Scans.scratch(spark, "freq_store_tt", sfDir)
    spark.conf.set("spark.sql.catalog.fqs",
      classOf[graft.sources.FreqStoreCatalog].getName)
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def time(label: String)(body: => Long): Unit =
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        val n = body
        println(f"[spj] $label rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }

    for (spj <- Seq(false, true)) {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", spj.toString)
      val t = spark.table(s"fqs.`$dir`")
      time(s"agg(point-key) spj=$spj") {
        t.groupBy("chromosome", "position")
          .agg(sum("numer").as("n"), max("freq_ppm").as("m")).count()
      }
      time(s"drift-join spj=$spj") {
        spark.sql(
          s"""SELECT h.chromosome, h.position, h.reference, h.observed,
                h.numer - COALESCE(o.numer, 0) AS dn
              FROM fqs.`$dir` h
              LEFT JOIN (SELECT * FROM fqs.`$dir` VERSION AS OF 1) o
                ON h.chromosome = o.chromosome AND h.position = o.position
                AND h.reference = o.reference AND h.observed = o.observed""")
          .count()
      }
    }
    spark.stop()
  }
}
