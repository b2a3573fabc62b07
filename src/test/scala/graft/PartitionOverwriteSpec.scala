package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Dynamic partition overwrite semantics: an overwrite whose incoming
  * frame holds ONE partition's data must replace exactly that partition
  * directory and leave every other partition's files untouched on disk —
  * the property that makes a daily partition refresh O(partition), not
  * O(table), at lake scale. */
class PartitionOverwriteSpec extends AnyFunSuite {
  import TestSpark._

  private def partFiles(root: java.io.File): Map[String, Set[(String, Long)]] =
    root.listFiles().filter(f => f.isDirectory && f.getName.contains("="))
      .map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSet
      }.toMap

  test("dynamic overwrite touches only the partition present in the frame") {
    val root = java.nio.file.Files.createTempDirectory("pow_spec").toFile
    val dir = root.getAbsolutePath + "/t"
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("value"), col("event_type"))
    ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val before = partFiles(new java.io.File(dir))
    assert(before.size > 1, "fixture must produce several partitions")

    ev.filter(col("event_type") === "click")
      .withColumn("value", col("value") * 2)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_type").parquet(dir)
    val after = partFiles(new java.io.File(dir))

    assert(after.keySet == before.keySet, "partition set must be unchanged")
    for (p <- before.keys if p != "event_type=click")
      assert(after(p) == before(p), s"untouched partition $p was rewritten")
    assert(after("event_type=click") != before("event_type=click"),
      "targeted partition must have new files")

    // content: non-click rows identical, click values doubled
    val back = spark.read.parquet(dir)
    val origSum = ev.filter(col("event_type") === "click")
      .agg(sum(Tables.dec4(col("value")))).collect()(0).getDecimal(0)
    val newSum = back.filter(col("event_type") === "click")
      .agg(sum(Tables.dec4(col("value") / 2))).collect()(0).getDecimal(0)
    assert(newSum.compareTo(origSum) == 0,
      "click partition content must be the doubled original")
    assert(back.count() == ev.count(), "row count preserved")
  }

  test("static overwrite mode would drop the other partitions (the hazard)") {
    val root = java.nio.file.Files.createTempDirectory("pow_static").toFile
    val dir = root.getAbsolutePath + "/t"
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type"))
    ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    ev.filter(col("event_type") === "click")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("event_type").parquet(dir)
    val left = spark.read.parquet(dir).select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(left == Set("click"),
      "static mode truncates the table root — this is why the op pins dynamic")
  }
}
