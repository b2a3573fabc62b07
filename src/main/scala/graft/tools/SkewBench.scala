package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev measurement (round-13, VERDICT #6): the planted-skew corpus —
  * one hot supplier in ~20% of sf1 lineitem (`lineitem_skew.parquet`,
  * GenScale) — joined against supplier three ways, interleaved warm
  * reps, best-of:
  *
  *  - `plain_noaqe`: the naive shuffle join with AQE skew handling OFF
  *    (the failure mode: one straggler task carries 20% of the table);
  *  - `plain_aqe`: the same plan under AQE's OptimizeSkewedJoin (the
  *    first line of defense — runtime partition split);
  *  - `salted`: [[graft.ops.Skew.saltedJoin]], 8 salts (the structural
  *    fix that works even where AQE can't see the skew, e.g. below its
  *    size thresholds or in aggregations).
  *
  * Writes one JSON line to the output path (default
  * BENCH_SKEW_SF1.json). Usage: runMain graft.tools.SkewBench
  * [sfDir] [outFile] [reps] */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "target/testdata-sf1"
    val out = if (args.length > 1) args(1) else "BENCH_SKEW_SF1.json"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // FULL-width rows: the straggler cost scales with the bytes the hot
    // partition carries, and a real supplier join ships the line's
    // payload columns, not just its keys
    val li = spark.read.parquet(s"$sfDir/lineitem_skew.parquet")
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val hotShare = li.filter(col("l_suppkey") === 1L).count().toDouble /
      li.count()
    println(f"[skewbench] hot-key share: ${hotShare * 100}%.1f%%")

    def agg(df: DataFrame): Long =
      df.agg(sum(length(col("s_name"))), count(lit(1))).collect()(0).getLong(1)

    // per-task stats, PER STAGE: local wall on 32 cores HIDES a
    // straggler (the hot task overlaps the rest); at 1000 executors
    // wall ≈ max task. Mixing every stage's tasks into one pool would
    // deflate the median with the many short scan/final-agg tasks, so
    // stats are grouped by stage and the reported numbers are the
    // JOIN stage's — identified as the stage with the largest max task
    // (the straggler stage; in all three variants that is the
    // shuffle-read join stage).
    val byStage = new java.util.concurrent.ConcurrentHashMap[Int,
      java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          if (e.taskMetrics != null) {
            val sr = e.taskMetrics.shuffleReadMetrics
            byStage.computeIfAbsent(e.stageId,
              _ => new java.util.concurrent.ConcurrentLinkedQueue())
              .add((e.taskMetrics.executorRunTime,
                if (sr != null) sr.totalBytesRead else 0L))
          }
        }
      })
    def p(xs: Seq[Long], q: Double): Long =
      if (xs.isEmpty) 0L else xs.sorted.apply(
        math.min(xs.size - 1, (xs.size * q).toInt))

    val best = scala.collection.mutable.Map[String, Double]()
      .withDefaultValue(Double.MaxValue)
    val taskStats = scala.collection.mutable.Map[String, (Long, Long, Long, Long)]()
    def time(label: String)(body: => Long): Unit = {
      import scala.jdk.CollectionConverters._
      byStage.clear()
      val t0 = System.nanoTime()
      val n = body
      val s = (System.nanoTime() - t0) / 1e9
      // the join stage = the stage whose slowest task is the run's max
      val stages = byStage.asScala.values.map(_.asScala.toSeq).toSeq
      val join = stages.maxByOption(ts => ts.map(_._1).maxOption.getOrElse(0L))
        .getOrElse(Nil)
      val ds = join.map(_._1)
      val rs = join.map(_._2).filter(_ > 0)
      val st = (ds.maxOption.getOrElse(0L), p(ds, 0.5),
        rs.maxOption.getOrElse(0L), p(rs, 0.5))
      if (best(label) > s) best(label) = s
      // task stats from the LAST rep (warm) — overwrite each rep
      taskStats(label) = st
      println(f"[skewbench] $label: $s%.2f s rows=$n " +
        f"joinStage maxTask=${st._1}%d ms p50Task=${st._2}%d ms " +
        f"maxShufRead=${st._3 / 1024}%d KB p50=${st._4 / 1024}%d KB")
    }
    def withAqe[T](skewOn: Boolean)(body: => T): T = {
      val keys = Seq("spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled")
      val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
      keys.foreach(k => spark.conf.set(k, skewOn.toString))
      try body finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    for (_ <- 1 to reps) {
      time("plain_noaqe")(withAqe(false)(agg(li.join(sup, "l_suppkey"))))
      time("plain_aqe")(withAqe(true)(agg(li.join(sup, "l_suppkey"))))
      time("salted")(withAqe(true)(agg(graft.ops.Skew.saltedJoin(
        li, sup, "l_suppkey", salts = 8,
        saltBy = col("l_orderkey") * lit(31) + col("l_linenumber")))))
    }
    val qs = best.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val ts = taskStats.toSeq.sortBy(_._1).map { case (k, (mx, md, rmx, rmd)) =>
      s"""\"$k\":{"max_task_ms":$mx,"p50_task_ms":$md,""" +
        s""""max_shuffle_read":$rmx,"p50_shuffle_read":$rmd}"""
    }.mkString("{", ",", "}")
    val line = s"""{"sf":"$sfDir","hot_share":$hotShare,""" +
      s""""queries":$qs,"task_stats":$ts,"cpus":"$cpus"}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
