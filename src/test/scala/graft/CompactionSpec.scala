package graft

import graft.ops.Compaction
import org.scalatest.funsuite.AnyFunSuite

/** Small-file compaction: many tiny files in, few target-sized files out,
  * rows preserved exactly. */
class CompactionSpec extends AnyFunSuite {
  import TestSpark._

  test("compaction collapses a fragmented store without changing its rows") {
    val src = "/root/repo/target/tmp/compact_src"
    val dest = "/root/repo/target/tmp/compact_dest"
    // fragment events into 32 small files
    Tables.events(spark, sf001).repartition(32)
      .write.mode("overwrite").parquet(src)
    val (srcBytes, srcFiles) = Compaction.fileStats(spark, src)
    assert(srcFiles == 32)

    // target ~ half the total → expect 2 files
    val compacted = Compaction.compactTo(spark, src, dest, srcBytes / 2 + 1)
    val (_, destFiles) = Compaction.fileStats(spark, dest)
    assert(destFiles == 2, s"expected 2 compacted files, got $destFiles")

    // rows identical (same multiset of event ids, same count)
    val a = spark.read.parquet(src).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = compacted.select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }
}
