package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted join == plain join, with the hot key actually spread across
  * shards. */
class SkewSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join equals the plain join on a skewed key") {
    // chromosome is the skewed key in the varda shape (22 values, one can
    // dominate); observations vs a per-chromosome summary table.
    val obs = graft.varda.VardaOps.obs(spark, sf0001)
      .select("obs_id", "chromosome", "position")
    val dim = obs.groupBy("chromosome")
      .agg(count(lit(1)).as("n_chrom_obs"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("obs_id", "n_chrom_obs").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val plain = rows(obs.join(dim, Seq("chromosome")))
    val salted = rows(Skew.saltedJoin(obs, dim, "chromosome",
      salts = 8, saltBy = col("position")))
    assert(plain.nonEmpty && salted == plain)
  }

  test("AQE splits a skewed shuffle partition (OptimizeSkewedJoin fires)") {
    // demonstrates the claim in Skew.scala's scaladoc: AQE's runtime
    // skew-join split IS the first line of defense, salting the fallback.
    // A partition is split when its size > max(skewedPartitionFactor ×
    // median, skewedPartitionThresholdInBytes), into chunks of
    // advisoryPartitionSizeInBytes — thresholds lowered here because the
    // synthetic hot key is ~1 MB, not the 256 MB production default.
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "131072",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 50000).select(
        when(col("id") < 40000, 0L).otherwise(col("id") % 100).as("k"),
        md5(col("id").cast("string")).as("pad"))
      val right = spark.range(0, 100).select(col("id").as("k"),
        col("id").cast("string").as("name"))
      val j = left.join(right, "k")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salting spreads one hot key over the requested shard count") {
    import spark.implicits._
    val hot = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val shards = hot
      .withColumn("__salt", pmod(hash(col("v")), lit(8)))
      .select("__salt").distinct().count()
    assert(shards == 8)
  }
}
