package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time one named query (args: key [sfDir] [reps]) without
  * paying the full Bench sweep — used when isolating a single key's
  * regression. Same session config as [[Bench]]. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
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
    // warmup
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val fn = SparkEntry.queries(key)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val t1 = System.nanoTime()
      val n = df.count()
      println(f"[benchone] $key rep$i: plan=${(t1 - t0) / 1e9}%.2f s " +
        f"exec=${(System.nanoTime() - t1) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
