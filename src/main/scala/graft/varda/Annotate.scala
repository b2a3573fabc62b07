package graft.varda

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Annotation write-back as VCF text (varda/tasks.py :: write_annotation
  * [U]): the reference streams a user's VCF through the frequency store
  * and emits it back with frequency INFO fields. Here the annotated
  * DataFrame (varda_annotate's shape) serializes through the shared
  * [[Vcf]] writer to a sites-only VCF — header plus tab-separated data
  * lines — as a distributed single-pass write instead of the reference's
  * per-record DB round trips. The output parses back with the SAME
  * [[Vcf.parseVcfLines]] reader the import path uses (AnnotateSpec
  * asserts the round trip), so annotate output can feed a re-import.
  */
object Annotate {

  /** chromosome/position/reference/observed/freq_ppm → VCF data lines
    * with `FREQ_PPM=<ppm>` as the INFO field. */
  def toVcfLines(annotated: DataFrame): DataFrame =
    Vcf.toVcfLines(
      annotated.withColumn("FREQ_PPM", col("freq_ppm").cast("string")),
      Seq("FREQ_PPM"))

  /** Run the annotation query and write a complete VCF to `outDir`:
    * data lines distributed (one part per partition, sorted within the
    * frame before write) plus a `00_header.vcf` part carrying the
    * `##fileformat` / `##INFO` / `#CHROM` header — readers that list the
    * directory see one valid sites-only VCF. */
  def writeAnnotatedVcf(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    toVcfLines(VardaOps.vardaAnnotate(spark, sfDir))
      .write.mode("overwrite").text(outDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(outDir), spark.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(outDir, "00_header.vcf"), true)
    try out.write(
      (Vcf.headerLines(Seq("FREQ_PPM")).mkString("\n") + "\n")
        .getBytes("UTF-8"))
    finally out.close()
  }
}
