package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.rules.RuleExecutor

/** Dev measurement utility (r19, guide §7.3): where does the DRIVER
  * spend a key's non-execution time? Prints the QueryPlanningTracker
  * phase durations for one invocation of a declared key plus the
  * session-wide top catalyst rules by wall time (RuleExecutor's
  * QueryExecutionMetering dump). Args: key [sfDir] [reps]. */
object PlanProfile {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: PlanProfile <key> [sfDir] [reps]")
      sys.exit(2)
    }
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
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val fn = graft.SparkEntry.queries(key)
    (1 to reps).foreach { i =>
      if (i == reps) RuleExecutor.resetMetrics() // only the warm rep's rules
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      val n = df.count()
      val t3 = System.nanoTime()
      val phases = df.queryExecution.tracker.phases
        .map { case (p, s) => f"$p=${(s.endTimeMs - s.startTimeMs) / 1e3}%.2f" }
        .mkString(" ")
      println(f"[planprofile] $key rep$i: fn=${(t1 - t0) / 1e9}%.2f " +
        f"plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f " +
        f"rows=$n phases{$phases}")
    }
    println("[planprofile] top rules by time (warm rep, whole session):")
    println(RuleExecutor.dumpTimeSpent())
    spark.stop()
  }
}
