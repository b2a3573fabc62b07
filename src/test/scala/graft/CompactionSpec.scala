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

  test("sorted compaction preserves z-order clustering that salt compaction destroys") {
    import org.apache.spark.sql.functions._
    val src = "/root/repo/target/tmp/compact_z_src"
    val destSalt = "/root/repo/target/tmp/compact_z_salt"
    val destSort = "/root/repo/target/tmp/compact_z_sort"
    // a z-ordered table fragmented into many clustered files (the
    // sink_zorder layout: per-file z-ranges pairwise disjoint)
    ops.Pipeline.sinkZorder(spark, sf0001).count()
    val zdir = ops.Scans.scratch(spark, "zorder_dst", sf0001)
    spark.read.parquet(zdir).repartitionByRange(16, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(src)
    def ranges(dir: String) = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("z"))
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    def disjoint(rs: Seq[(Long, Long)]) =
      rs.zip(rs.tail).forall { case ((_, hi), (lo2, _)) => hi <= lo2 }
    assert(disjoint(ranges(src).toSeq), "fixture must start clustered")

    val (srcBytes, srcFiles) = Compaction.fileStats(spark, src)
    assert(srcFiles == 16)
    val target = srcBytes / 4 + 1 // → 4 files
    // the salt path loses the clustering (that's WHY compactSorted exists)
    Compaction.compactTo(spark, src, destSalt, target)
    assert(!disjoint(ranges(destSalt).toSeq),
      "salt compaction unexpectedly kept z-clustering; fixture too small?")
    // the sorted path keeps it, at the same file budget
    val compacted = Compaction.compactSorted(spark, src, destSort, target, Seq("z"))
    val rs = ranges(destSort).toSeq
    assert(rs.length >= 2 && rs.length <= 6, s"got ${rs.length} files")
    assert(disjoint(rs), s"sorted compaction lost clustering: $rs")
    // rows preserved exactly
    val key = (d: org.apache.spark.sql.DataFrame) => d
      .select("z", "l_orderkey", "l_partkey", "line_no")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(key(compacted) == key(spark.read.parquet(src)))
  }

  test("sorted compaction keeps a hive partition layout and per-dir clustering") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val src = "/root/repo/target/tmp/compact_zp_src"
    val dest = "/root/repo/target/tmp/compact_zp_dest"
    val df = (1 to 4000).map(i => (i.toLong, s"p${i % 3}", (i * 7919L) % 100000))
      .toDF("id", "k", "v")
    df.repartition(8).write.mode("overwrite").partitionBy("k").parquet(src)
    val (srcBytes, _) = Compaction.fileStats(spark, src)
    val compacted = Compaction.compactSorted(spark, src, dest,
      srcBytes / 6 + 1, Seq("v"))
    assert(Compaction.partitionStats(spark, dest).keySet ==
      Compaction.partitionStats(spark, src).keySet)
    // within every partition dir, per-file v-ranges are disjoint
    val perDir = spark.read.parquet(dest)
      .select(input_file_name().as("f"), col("k"), col("v"))
      .groupBy("k", "f").agg(min("v").as("lo"), max("v").as("hi"))
      .collect().groupBy(_.getAs[String]("k"))
    for ((k, rows) <- perDir) {
      val rs = rows.map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"))).sortBy(_._1)
      rs.zip(rs.tail).foreach { case ((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"partition $k: file v-ranges overlap ($hi > $lo2)")
      }
    }
    val key = (d: org.apache.spark.sql.DataFrame) => d.select("id", "k", "v")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(key(compacted) == key(spark.read.parquet(src)))
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
