package graft.tools

import org.apache.spark.sql.SparkSession

/** Decade-ratio harness (round 14): for each named key, measure the
  * WARM floor at two scales in one session each and report the
  * sf-to-sf ratio. The full Bench artifact times every key exactly
  * once, so a key's line there carries its one-time plan/codegen/JIT
  * and first-parquet-touch cost; at sf1 that cost can dominate a
  * sub-second operator and masquerade as super-linear scaling. Here
  * each key runs `reps` times per scale and the MINIMUM counts — the
  * data-dependent floor the 100 TB design argument is actually about
  * (on a cluster the one-time costs amortize across a job's lifetime;
  * they do not multiply with data).
  *
  * Usage: runMain graft.tools.RatioBench <sfDirA> <sfDirB> <out.json> key...
  * Emits {key: {a: sec, b: sec, ratio: b/a, coldB: sec}}. */
object RatioBench {
  def main(args: Array[String]): Unit = {
    val (dirA, dirB, outPath) = (args(0), args(1), args(2))
    val keys = args.drop(3).toSeq
    require(keys.nonEmpty, "usage: RatioBench <sfA> <sfB> <out.json> key...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("RATIO_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(key: String, dir: String): (Double, Double) = {
      val fn = graft.SparkEntry.queries(key)
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      (runs.min, runs.head)
    }
    val lines = keys.map { k =>
      val (aMin, _) = time(k, dirA)
      val (bMin, bCold) = time(k, dirB)
      val r = bMin / aMin
      println(f"[ratio] $k%-28s a=$aMin%7.2f s  b=$bMin%7.2f s  " +
        f"ratio=$r%5.2f  coldB=$bCold%7.2f s")
      f""""$k": {"a": $aMin%.3f, "b": $bMin%.3f, "ratio": $r%.2f, "coldB": $bCold%.3f}"""
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      lines.mkString("{", ",\n ", "}") + "\n")
    spark.stop()
  }
}
