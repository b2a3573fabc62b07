package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.ConcurrentLinkedQueue

/** TEMPORARY profiling harness for the FreqStore commit path (round 10).
  * Prints a per-job timeline (submit→complete, #stages, task time) and
  * driver-side phase timers so the wall can be attributed instead of
  * modeled. Deleted after use — see git history.
  */
object DebugFreq {
  case class Ev(kind: String, id: Long, t: Long, info: String)
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val evs = new ConcurrentLinkedQueue[Ev]()
    val t00 = System.nanoTime()
    def now = (System.nanoTime() - t00) / 1e6 // ms
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        evs.add(Ev("job+", e.jobId, System.nanoTime(), s"stages=${e.stageIds.size}"))
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        evs.add(Ev("job-", e.jobId, System.nanoTime(), ""))
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        evs.add(Ev("stg+", e.stageInfo.stageId, System.nanoTime(),
          s"tasks=${e.stageInfo.numTasks} ${e.stageInfo.name.take(40)}"))
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        evs.add(Ev("stg-", e.stageInfo.stageId, System.nanoTime(),
          s"tasks=${e.stageInfo.numTasks} ${e.stageInfo.name.take(40)}"))
    })
    // warmup: one full replay untimed
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    SparkEntry.queries("varda_freq_incremental")(spark, sfDir).count()
    evs.clear()
    // in-JVM stack sampler: every 25 ms, top distinctive frame of every
    // live non-executor thread doing Spark/graft work (jstack cannot
    // attach in this sandbox)
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        import scala.jdk.CollectionConverters._
        for ((t, st) <- Thread.getAllStackTraces.asScala
             if st.nonEmpty && !t.getName.startsWith("Executor task launch")
               && !t.getName.contains("dispatcher")
               && !t.getName.contains("netty")) {
          val frames = st.map(_.toString)
          val interesting = frames.find(f =>
            f.contains("org.apache.spark.sql.catalyst.optimizer") ||
            f.contains("org.apache.spark.sql.catalyst.analysis") ||
            f.contains("org.apache.spark.sql.execution.datasources") ||
            f.contains("janino") || f.contains("CodeGenerator") ||
            f.contains("RawLocalFileSystem") || f.contains("ChecksumF") ||
            f.contains("graft."))
          for (f <- interesting)
            hist.merge(t.getName.take(24) + " | " + f.take(120), 1, (a, b) => a + b)
        }
        Thread.sleep(25)
      }
    }, "dbg-sampler")
    sampler.setDaemon(true); sampler.start()
    val t0 = System.nanoTime()
    println(s"[debugfreq] ===== timed replay starts at ${now} ms =====")
    SparkEntry.queries("varda_freq_incremental")(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    Thread.sleep(300)
    locally {
      import scala.jdk.CollectionConverters._
      println("[debugfreq] ---- stack sample histogram (>=3 hits) ----")
      for ((k, v) <- hist.asScala.toSeq.sortBy(-_._2).take(40) if v >= 3)
        println(f"[debugfreq] $v%4d  $k")
    }
    import scala.jdk.CollectionConverters._
    val all = evs.asScala.toSeq.sortBy(_.t)
    // per-job spans
    val jobStart = all.filter(_.kind == "job+").map(e => e.id -> e.t).toMap
    val jobEnd = all.filter(_.kind == "job-").map(e => e.id -> e.t).toMap
    println(f"[debugfreq] total wall = $wall%.2f s, jobs = ${jobStart.size}")
    for (j <- jobStart.keys.toSeq.sorted) {
      val s = jobStart(j); val e = jobEnd.getOrElse(j, s)
      println(f"[debugfreq] job $j%3d  start=${(s - t0) / 1e6}%8.0f ms  dur=${(e - s) / 1e6}%7.0f ms")
    }
    // stage spans
    val stgS = all.filter(_.kind == "stg+")
    val stgE = all.filter(_.kind == "stg-").map(e => e.id -> e.t).toMap
    println(s"[debugfreq] stages = ${stgS.size}")
    for (e <- stgS.sortBy(_.t)) {
      val fin = stgE.getOrElse(e.id, e.t)
      println(f"[debugfreq] stg ${e.id}%4d start=${(e.t - t0) / 1e6}%8.0f dur=${(fin - e.t) / 1e6}%6.0f ms ${e.info}")
    }
    // busy coverage: fraction of the wall with >=1 job running
    val spans = jobStart.toSeq.flatMap { case (j, s) =>
      jobEnd.get(j).map(e => (s, e)) }.sortBy(_._1)
    var covered = 0L; var cur = 0L; var curEnd = 0L
    for ((s, e) <- spans) {
      if (s > curEnd) { covered += curEnd - cur; cur = s; curEnd = e }
      else curEnd = math.max(curEnd, e)
    }
    covered += curEnd - cur
    println(f"[debugfreq] job-covered wall = ${covered / 1e9}%.2f s of $wall%.2f s (gaps = driver-only time)")
    spark.stop()
  }
}
