package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement (r20, verdict item 5): is dedup_simhash's 64-SUM
  * bit-vote aggregate actually its wall? Times three forms of the
  * per-doc signature aggregate over the SAME shingle input, warm reps
  * in one JVM:
  *
  *  - `wide`: the shipped form — 64 `sum((v_k >> b) & 1)` + count.
  *  - `packed`: 4 sums of 16-bit-LANE-packed counters (one lane per
  *    band at each bit position) + count — the verdict's candidate.
  *    EXACT ONLY while every doc has < 2^16 distinct shingles; shipped
  *    code cannot assume that bound, so this form is measurement-only.
  *  - `explodeless`: wide aggregate reading a pre-projected 4-column
  *    frame, isolating the explode's share.
  *
  * Usage: runMain graft.tools.SimhashWidthBench [sfDir] [reps] */
object SimhashWidthBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    val mults = Seq(
      (2654435761L, 16777619L, 31L),
      (2246822519L, 3266489917L, 97L),
      (3266489917L, 668265263L, 193L),
      (668265263L, 2654435761L, 389L))
    def tokenValue(k: Int): String = {
      val (m1, m2, m3) = mults(k)
      s"""(length(t) * CAST($m1 AS BIGINT)
          + ascii(substr(t,1,1)) * CAST($m2 AS BIGINT)
          + ascii(substr(t,length(t),1)) * CAST($m3 AS BIGINT)) % 2147483647"""
    }
    def shingles = graft.ops.Llm.shingles(
        graft.Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("shingle").as("t"))
    def withV = (0 until 4).foldLeft(shingles)((df, k) =>
      df.withColumn(s"v$k", expr(tokenValue(k))))

    def wideAggs = (0 until 4).flatMap(k => (0 until 16).map(b =>
      sum(expr(s"shiftright(v$k, $b) & 1")).as(s"s${k}_$b"))) :+
      count(lit(1)).as("n")
    // 16 bit-positions per sum, lane l = band k's count at bit b:
    // pack band k's bit-b indicator into lane k of word b%4... here:
    // one packed word per band pair — 4 sums total, 16-bit lanes
    def packedAggs = (0 until 4).map(k =>
      sum(expr((0 until 4).map(b =>
        s"((shiftright(v$k, ${4 * (k % 4) + b}) & 1) * ${1L << (16 * b)}L)")
        .mkString("(", " + ", ")"))).as(s"p$k")) :+ count(lit(1)).as("n")

    def time(tag: String)(f: => Long): Unit = (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[simhashwidth] $tag rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    time("wide") {
      withV.groupBy("doc_id").agg(wideAggs.head, wideAggs.tail: _*).count()
    }
    time("packed") {
      withV.groupBy("doc_id").agg(packedAggs.head, packedAggs.tail: _*).count()
    }
    // 32-bit lanes: positions b and b+8 share a word — EXACT for any doc
    // Spark can represent (string cells cap at 2^31 bytes, so distinct
    // shingles per doc < 2^31 and lane 0 never carries into lane 1)
    def packed32Aggs = (0 until 4).flatMap(k => (0 until 8).map(b =>
      sum(expr(s"(shiftright(v$k, $b) & 1) + ((shiftright(v$k, ${b + 8}) & 1) * ${1L << 32}L)"))
        .as(s"q${k}_$b"))) :+ count(lit(1)).as("n")
    time("packed32") {
      withV.groupBy("doc_id").agg(packed32Aggs.head, packed32Aggs.tail: _*).count()
    }
    val proj = withV.select(col("doc_id"), col("v0"), col("v1"), col("v2"),
      col("v3")).localCheckpoint()
    time("explodeless-wide") {
      proj.groupBy("doc_id").agg(wideAggs.head, wideAggs.tail: _*).count()
    }
    spark.stop()
  }
}
