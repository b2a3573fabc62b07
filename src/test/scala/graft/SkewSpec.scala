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

  test("salting spreads one hot key over the requested shard count") {
    import spark.implicits._
    val hot = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val shards = hot
      .withColumn("__salt", pmod(hash(col("v")), lit(8)))
      .select("__salt").distinct().count()
    assert(shards == 8)
  }
}
