package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the unglamorous operation every long-running
  * parquet lake needs: streaming ingest and fine-grained partitioning
  * accumulate files far below the ideal scan unit, and scan throughput
  * collapses under per-file open/footer costs long before data volume is
  * the problem.
  *
  * `compactTo` rewrites a parquet directory into ceil(totalBytes /
  * targetFileBytes) files via a single round-robin repartition — one
  * shuffle, no driver-side data movement, preserving rows exactly. The
  * rewrite goes to a NEW directory: an in-place overwrite of a directory
  * being read is not atomic on object stores, so the swap (rename or
  * pointer flip) is left to the caller's catalog/workflow layer, which is
  * where real deployments do it. */
object Compaction {

  /** Total bytes and file count of the parquet data files under `dir`. */
  def fileStats(spark: SparkSession, dir: String): (Long, Int) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listFiles(p, true)
    var bytes = 0L; var n = 0
    while (files.hasNext) {
      val f = files.next()
      if (f.getPath.getName.endsWith(".parquet")) { bytes += f.getLen; n += 1 }
    }
    (bytes, n)
  }

  /** Rewrite `srcDir` into `destDir` with files of ~`targetFileBytes`.
    * Returns the compacted DataFrame reader. */
  def compactTo(spark: SparkSession, srcDir: String, destDir: String,
      targetFileBytes: Long): DataFrame = {
    val (bytes, _) = fileStats(spark, srcDir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(srcDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(destDir)
    spark.read.parquet(destDir)
  }
}
