package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement: the freqstore DSv2 COLUMNAR read path vs the
  * row-based readers, warm reps on the same store in one JVM — the
  * full-store serve (all 7 columns, derived compute loop), a pruned
  * base projection, an aggregation over the scan, and the
  * catalog drift join. Not part of the driver contract.
  * Usage: runMain graft.tools.ColBench [sfDir] [reps] */
object ColBench {
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

    graft.SparkEntry.queries("varda_freq_asof")(spark, sfDir).count()
    val dir = graft.ops.Scans.scratch(spark, "freq_store_tt", sfDir)
    spark.conf.set("spark.sql.catalog.fqs",
      classOf[graft.sources.FreqStoreCatalog].getName)
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    // interleaved A/B: per rep run BOTH configs back to back, so JIT
    // warmup / GC pressure / box load spread evenly; report best-of
    val best = scala.collection.mutable.Map[String, Double]()
      .withDefaultValue(Double.MaxValue)
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      val s = (System.nanoTime() - t0) / 1e9
      best(label) = math.min(best(label), s)
      println(f"[colbench] $label: $s%.2f s rows=$n")
    }

    for (_ <- 1 to reps; useCol <- Seq(false, true)) {
      graft.sources.FreqStoreDataSource.columnarEnabled = useCol
      val t = spark.read.format("freqstore").load(dir)
      time(s"serve-all7 columnar=$useCol") {
        t.agg(sum("numer"), sum("denom"), sum("freq_ppm")).collect()
        1L }
      time(s"full-collect columnar=$useCol") {
        t.agg(sum(length(col("chromosome"))) + sum(length(col("reference"))) +
          sum(length(col("observed"))) + sum(col("position")) +
          sum(col("numer")) + sum(col("denom")) +
          sum(col("freq_ppm"))).collect(); 1L }
      time(s"base-proj columnar=$useCol") {
        t.select("chromosome", "position", "numer")
          .agg(sum("position"), sum("numer")).collect(); 1L }
      time(s"denom-only columnar=$useCol") {
        t.agg(sum(col("denom"))).collect(); 1L }
      time(s"freq-only columnar=$useCol") {
        t.agg(sum(col("freq_ppm"))).collect(); 1L }
      time(s"all-base columnar=$useCol") {
        t.select("chromosome", "position", "reference", "observed", "numer")
          .agg(sum(length(col("chromosome"))) + sum(length(col("reference"))) +
            sum(length(col("observed"))) + sum(col("position")) +
            sum(col("numer"))).collect(); 1L }
      time(s"drift-join columnar=$useCol") {
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
    println("[colbench] === best-of ===")
    best.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"[colbench] BEST $k: $v%.2f s") }
    spark.stop()
  }
}
