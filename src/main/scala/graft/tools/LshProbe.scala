package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade measurement for `sim_ann_lsh`'s scale contract (round 18):
  * candidates/query must stay ~flat as the corpus grows 10× — the
  * property the multi-probe shape is designed to hold (bits grows with
  * log2(n·probes/occupancy), so expected per-probe occupancy is
  * constant). Counts the DECLARED key's own candidate stage
  * ([[graft.ops.Llm.lshCandidatePairs]] — shared code, not a
  * re-derivation) and prints one JSON line:
  * {"sf":…,"n":…,"queries":…,"candidates":…,"cands_per_query":…}.
  * Args: sfDir [outFile]. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.Tables.embeddings(spark, sfDir).count()
    // denominator = the CORPUS's query count (label-0 rows), not the
    // distinct qids in the candidate pairs (round-19 ADVICE: a query
    // producing zero candidates must stay in the denominator, else
    // cands_per_query reads biased high exactly in the sparse-bucket
    // regime the decade comparison cares about)
    val queries = graft.Tables.embeddings(spark, sfDir)
      .filter(col("label") === 0).count()
    val cands = graft.ops.Llm.lshCandidatePairs(spark, sfDir)
      .agg(count(lit(1)).as("cands")).head().getLong(0)
    val perQ = if (queries == 0) 0.0 else cands.toDouble / queries
    val line = s"""{"sf":"$sfDir","n":$n,"queries":$queries,""" +
      s""""candidates":$cands,"cands_per_query":$perQ}"""
    println(line)
    if (args.length > 1)
      java.nio.file.Files.write(java.nio.file.Paths.get(args(1)),
        (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
