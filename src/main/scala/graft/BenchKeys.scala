package graft

import org.apache.spark.sql.SparkSession

/** Dev utility (round-10): time a NAMED SUBSET of queries at an
  * arbitrary sfDir and persist the result as JSON — the sf1
  * scale-point harness (args: sfDir outFile key...). Two reps per key;
  * the second (warm) rep is recorded, matching BenchOne's reading. */
object BenchKeys {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val out = args(1)
    val keys = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def loadavg: String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).mkString(",")
      catch { case _: Throwable => "unavailable" }
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val l0 = loadavg
    val timed = keys.map { k =>
      val fn = SparkEntry.queries(k)
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[benchkeys] $k: $sec%.2f s rows=$n")
        sec
      }
      k -> reps.last
    }
    val qs = timed.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val line = s"""{"sf":"$sfDir","queries":$qs,""" +
      s""""loadavg_start":"$l0","loadavg_end":"$loadavg","cpus":"$cpus"}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
