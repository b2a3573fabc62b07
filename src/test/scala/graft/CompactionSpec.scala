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

  test("compaction preserves a partitionBy directory layout") {
    val src = "/root/repo/target/tmp/compact_part_src"
    val dest = "/root/repo/target/tmp/compact_part_dest"
    // fragmented partitioned store: 8 files inside EACH event_type dir
    Tables.events(spark, sf001).repartition(8)
      .write.mode("overwrite").partitionBy("event_type").parquet(src)
    val srcStats = Compaction.partitionStats(spark, src)
    assert(srcStats.keys.forall(_.startsWith("event_type=")))
    assert(srcStats.size > 1, "fixture needs several partitions")

    // target ~ half of each partition's bytes → expect 2 files per dir
    val target = srcStats.values.min / 2 + 1
    val compacted = Compaction.compactTo(spark, src, dest, target)
    val destStats = Compaction.partitionStats(spark, dest)
    assert(destStats.keySet == srcStats.keySet,
      s"layout changed: ${destStats.keySet} vs ${srcStats.keySet}")
    // per-partition file budget honored: ceil(bytes/target) per dir
    val p0 = new org.apache.hadoop.fs.Path(dest)
    val fs = p0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    for ((rel, bytes) <- srcStats) {
      val expect = math.max(1, math.ceil(bytes.toDouble / target).toInt)
      val got = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dest/$rel"))
        .count(_.getPath.getName.endsWith(".parquet"))
      assert(got == expect, s"$rel: $got files, expected $expect")
    }
    // rows identical, partition column values intact
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select("event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(key(spark.read.parquet(src)) == key(compacted))
  }

  test("partitioned compaction keeps rows under hive-escaped and null partition values") {
    import spark.implicits._
    val src = "/root/repo/target/tmp/compact_esc_src"
    val dest = "/root/repo/target/tmp/compact_esc_dest"
    // partition values the writer must hive-escape ('=' ':' '%' space)
    // plus a null — the cases where reconstructing the dir name from the
    // value string diverges from what's on disk
    val df = Seq(
      (1L, "a b"), (2L, "a b"),
      (3L, null.asInstanceOf[String]),
      (4L, "x=y:z"), (5L, "p%q"), (6L, "plain"), (7L, "c+d"))
      .toDF("id", "k")
    df.repartition(2).write.mode("overwrite").partitionBy("k").parquet(src)
    val srcStats = Compaction.partitionStats(spark, src)
    assert(srcStats.keys.forall(_.startsWith("k=")), srcStats.keySet.toString)

    val compacted = Compaction.compactTo(spark, src, dest, Long.MaxValue)
    // every row survives, including null and escaped partitions
    val key = (d: org.apache.spark.sql.DataFrame) => d.select("id", "k")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).sorted.toSeq
    assert(key(compacted) == key(spark.read.parquet(src)))
    // and the on-disk layout is preserved dir-for-dir
    assert(Compaction.partitionStats(spark, dest).keySet == srcStats.keySet)
  }
}
