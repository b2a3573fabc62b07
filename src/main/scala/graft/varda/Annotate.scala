package graft.varda

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Annotation write-back as VCF-shaped text (varda/tasks.py ::
  * write_annotation [U]): the reference streams a user's VCF through the
  * frequency store and emits it back with frequency INFO fields. Here the
  * annotated DataFrame (varda_annotate's shape) serializes to
  * tab-separated VCF data lines with the frequency as an INFO key, written
  * as sorted text — a distributed single-pass write instead of the
  * reference's per-record DB round trips. */
object Annotate {

  /** chromosome/position/reference/observed/freq_ppm → VCF data lines. */
  def toVcfLines(annotated: DataFrame): DataFrame =
    annotated.select(concat_ws("\t",
      col("chromosome"), col("position"), lit("."),
      col("reference"), col("observed"), lit("."), lit("PASS"),
      concat(lit("FREQ_PPM="), col("freq_ppm"))).as("value"))

  /** Run the annotation query and write the VCF text to `outDir`
    * (one part per partition; sorted within the frame before write). */
  def writeAnnotatedVcf(spark: SparkSession, sfDir: String, outDir: String): Unit =
    toVcfLines(VardaOps.vardaAnnotate(spark, sfDir))
      .write.mode("overwrite").text(outDir)

  /** Parse VCF data lines back to the annotated shape (inverse of
    * [[toVcfLines]]) — proves the round trip is lossless. */
  def parseVcfLines(lines: DataFrame): DataFrame =
    lines.select(split(col("value"), "\t").as("f"))
      .select(
        element_at(col("f"), 1).as("chromosome"),
        element_at(col("f"), 2).cast("long").as("position"),
        element_at(col("f"), 4).as("reference"),
        element_at(col("f"), 5).as("observed"),
        regexp_extract(element_at(col("f"), 8), "FREQ_PPM=(-?[0-9]+)", 1)
          .cast("long").as("freq_ppm"))
}
