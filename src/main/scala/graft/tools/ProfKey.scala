package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev profiler: run one declared key with a stage-timeline listener and
  * print per-job/per-stage wall spans plus the driver-only gaps between
  * jobs — the round-10 methodology (job-covered wall vs driver gaps) as
  * a reusable main. Not part of the driver contract. */
object ProfKey {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val noAqe = sys.env.get("PROF_NO_AQE").contains("1")
    val spark0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    val spark =
      if (noAqe) {
        val s = spark0.newSession()
        s.conf.set("spark.sql.adaptive.enabled", "false")
        s
      } else spark0
    spark.sparkContext.setLogLevel("WARN")

    case class J(id: Int, start: Long, var end: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0, var desc: String = "")
    val jobs = new scala.collection.mutable.LinkedHashMap[Int, J]
    // stage → job so concurrent jobs' tasks attribute correctly (the
    // commit path deliberately overlaps jobs; attributing to the most
    // recently started job miscounted exactly those workloads)
    val stageJob = new scala.collection.mutable.HashMap[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          jobs(e.jobId) = J(e.jobId, e.time,
            stages = e.stageInfos.size, desc = d.take(60))
          e.stageInfos.foreach(si => stageJob(si.stageId) = e.jobId)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          stageJob.get(e.stageId).flatMap(jobs.get).foreach(_.tasks += 1)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val fn = graft.SparkEntry.queries(key)
    for (rep <- 1 to reps) {
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      val t0ms = System.currentTimeMillis()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      jobs.synchronized {
        val js = jobs.values.toSeq.sortBy(_.start)
        var covered = 0L
        var lastEnd = 0L
        println(f"== $key rep$rep wall=$wall%.2f s rows=$n jobs=${js.size}")
        for (j <- js) {
          val gap = if (lastEnd == 0) 0L else math.max(0L, j.start - lastEnd)
          covered += math.max(0L, j.end - j.start)
          lastEnd = math.max(lastEnd, j.end)
          println(f"  job ${j.id}%3d  ${(j.end - j.start) / 1e3}%6.2f s  " +
            f"gapBefore=${gap / 1e3}%5.2f s  stages=${j.stages}%2d  " +
            f"tasks=${j.tasks}%4d  ${j.desc}")
        }
        val head = js.headOption.map(j => (j.start - t0ms) / 1e3).getOrElse(0.0)
        println(f"  covered=${covered / 1e3}%.2f s  headGap=$head%.2f s")
      }
    }
    spark.stop()
  }
}
