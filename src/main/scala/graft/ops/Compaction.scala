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

  /** Per-partition-directory byte totals: hive-style `k=v` relative dir →
    * parquet bytes under it. The un-partitioned root maps to "". Driver
    * state is O(partition dirs) — what any real compactor reads from its
    * catalog/manifest. Relative dirs come from relativizing against the
    * fs-QUALIFIED base URI (same discipline as Joins.sourceFingerprint):
    * a raw string stripPrefix is a silent no-op when the caller's path
    * spelling differs from the filesystem's (relative vs absolute vs
    * scheme-qualified), which would flatten the layout downstream. Keys
    * are the DECODED on-disk dir names (hive-escaped values like
    * `k=a%253Ab` stay exactly as the writer spelled them on disk). */
  def partitionStats(spark: SparkSession, dir: String): Map[String, Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = fs.makeQualified(p).toUri
    val acc = scala.collection.mutable.Map.empty[String, Long]
    val files = fs.listFiles(p, true)
    while (files.hasNext) {
      val f = files.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val rel = base.relativize(f.getPath.getParent.toUri)
          .getPath.stripSuffix("/")
        acc(rel) = acc.getOrElse(rel, 0L) + f.getLen
      }
    }
    acc.toMap
  }

  /** Rewrite `srcDir` into `destDir` with files of ~`targetFileBytes`,
    * PRESERVING a hive-style `partitionBy` directory layout (round-7; a
    * global round-robin would flatten it): each partition directory is
    * compacted to ceil(itsBytes / targetFileBytes) files independently —
    * rows get a deterministic within-partition salt `hash(row) mod
    * nFiles(partition)` (the per-partition file budget rides a broadcast
    * O(partitions) frame), one shuffle clusters (partition, salt), and
    * the dynamic-partitioned write emits exactly one file per cluster
    * into its directory. An un-partitioned source keeps the single
    * round-robin repartition. Real lakes compact exactly this way:
    * within partitions, so readers' partition pruning and concurrent
    * writers' partition-level commits are undisturbed. Returns the
    * compacted DataFrame reader. */
  def compactTo(spark: SparkSession, srcDir: String, destDir: String,
      targetFileBytes: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val stats = partitionStats(spark, srcDir)
    val partitioned = stats.keys.forall(_.nonEmpty) && stats.nonEmpty &&
      stats.keys.forall(_.split("/").forall(_.contains("=")))
    val srcP = new Path(srcDir)
    val srcFs = srcP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df = spark.read.parquet(srcDir)
    if (!partitioned) {
      val bytes = stats.values.sum
      val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
      df.repartition(nFiles)
        .write.mode("overwrite").parquet(destDir)
    } else {
      val partCols = stats.keys.head.split("/").map(_.split("=")(0)).toSeq
      val dataCols = df.columns.filterNot(partCols.contains).toSeq
      // planning phase (driver, O(output files) — the manifest any real
      // compactor's planner holds): per-partition file budget, and one
      // PROBE int per output file chosen so Spark's Murmur3 shuffle slot
      // pmod(hash(probe), nTasks) is unique per file — every file-group
      // then owns exactly one write task, so neither AQE coalescing nor
      // hash collisions can merge two groups' output
      val budgets = stats.toSeq.sortBy(_._1).map { case (rel, bytes) =>
        (rel, math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt))
      }
      val nTasks = budgets.map(_._2).sum
      val slotTaken = new java.util.BitSet(nTasks)
      var cand = 0
      def nextProbe(): Int = {
        var p = cand
        while ({
          val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(p, 42)
          val slot = ((h % nTasks) + nTasks) % nTasks
          if (!slotTaken.get(slot)) { slotTaken.set(slot); false } else true
        }) p += 1
        cand = p + 1
        p
      }
      val probeRows = budgets.flatMap { case (rel, nf) =>
        (0 until nf).map(salt => (rel, salt, nextProbe()))
      }
      val (budget, probes) = {
        import spark.implicits._
        (budgets.toDF("__c_rel", "__c_nf"),
          probeRows.toDF("__c_rel", "__c_salt", "__c_probe"))
      }
      // the data-side partition-dir key comes from input_file_name(), NOT
      // from re-rendering the partition column values: the writer
      // hive-escapes special chars ('=', ':', '%', …) and spells nulls as
      // __HIVE_DEFAULT_PARTITION__, so a string-cast reconstruction
      // silently mismatches those dirs and the budget join would DROP
      // their rows. input_file_name() is the on-disk path URL-encoded
      // once more (space→%20, %→%25 — probed empirically); one
      // url_decode recovers exactly the decoded on-disk string that
      // partitionStats keys carry, making the join structural rather
      // than reconstructive.
      val bu = srcFs.makeQualified(srcP).toUri
      val decodedBase = bu.getScheme + "://" +
        Option(bu.getAuthority).getOrElse("") +
        bu.getPath.stripSuffix("/")
      // url_decode is form-decoding ('+' → space), but input_file_name
      // encodes spaces as %20 and passes literal '+' through — so every
      // raw '+' is a genuine '+' and must be shielded before decoding
      val relExpr = regexp_replace(
        url_decode(regexp_replace(input_file_name(), "\\+", "%2B")).substr(
          lit(decodedBase.length + 2), lit(Int.MaxValue)),
        "/[^/]*$", "")
      df.withColumn("__c_rel", relExpr)
        .join(broadcast(budget), "__c_rel")
        .withColumn("__c_salt",
          pmod(hash(dataCols.map(col): _*), col("__c_nf")))
        .join(broadcast(probes), Seq("__c_rel", "__c_salt"))
        .repartition(nTasks, col("__c_probe"))
        .drop("__c_rel", "__c_nf", "__c_salt", "__c_probe")
        .write.mode("overwrite").partitionBy(partCols: _*).parquet(destDir)
    }
    spark.read.parquet(destDir)
  }

  /** Clustering-PRESERVING compaction (round-8): [[compactTo]]'s
    * round-robin salt maximizes balance but shreds any sort/z-order the
    * source files carry — compacting a `sink_zorder` table through it
    * silently forfeits the disjoint per-file ranges the write paid a
    * range shuffle for, and every footer-min/max data-skipping scan
    * thereafter reads the whole table. When the table's clustering key is
    * known (real compactors read it from the catalog's table spec — the
    * same place `sink_zorder` would record `z`), compact with ONE
    * `repartitionByRange` on that key + `sortWithinPartitions`: files
    * come out target-sized AND pairwise range-disjoint, so the layout
    * survives the rewrite. A hive-partitioned source range-partitions on
    * (partition cols ++ sort key): each output task owns a contiguous
    * slice of one partition's key space, and the dynamic-partitioned
    * write keeps the directory layout intact.
    *
    * Range boundaries come from Spark's reservoir sampling — file sizes
    * track the key distribution rather than matching byte budgets
    * exactly (the trade every sorted compactor makes; a heavily skewed
    * key can over-fill one file). CompactionSpec asserts per-file
    * disjointness and row preservation over a z-ordered source. */
  def compactSorted(spark: SparkSession, srcDir: String, destDir: String,
      targetFileBytes: Long, sortCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(sortCols.nonEmpty, "compactSorted needs the clustering key")
    val stats = partitionStats(spark, srcDir)
    val partitioned = stats.nonEmpty && stats.keys.forall(_.nonEmpty) &&
      stats.keys.forall(_.split("/").forall(_.contains("=")))
    val df = spark.read.parquet(srcDir)
    val bytes = stats.values.sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val partCols: Seq[String] =
      if (partitioned) stats.keys.head.split("/").map(_.split("=")(0)).toSeq
      else Nil
    val keyCols = (partCols ++ sortCols).map(col)
    df.repartitionByRange(nFiles, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
      .write.mode("overwrite")
      .partitionBy(partCols: _*).parquet(destDir)
    spark.read.parquet(destDir)
  }
}
