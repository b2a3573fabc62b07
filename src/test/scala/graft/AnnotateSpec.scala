package graft

import graft.varda.{Annotate, ExprLang, Normalize, VardaOps, Vcf}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Annotation VCF write-back, chromosome normalization, and the `*`
  * selector — the remaining reference-surface pieces. */
class AnnotateSpec extends AnyFunSuite {
  import TestSpark._

  test("annotated VCF round-trips losslessly through the import reader") {
    val out = "/root/repo/target/tmp/annotated_vcf"
    Annotate.writeAnnotatedVcf(spark, sf0001, out)
    val expected = VardaOps.vardaAnnotate(spark, sf0001)
    // the SAME header-aware reader the import path uses parses the
    // write-back output: sites-only records (no FORMAT/sample columns,
    // spread across headerless data parts) must survive with null
    // sample fields — not vanish into an empty posexplode or be dropped
    // by the per-file header join
    val parsed = Vcf.parseVcfLines(spark.read.text(out))
    assert(parsed.filter(col("sample_slot").isNotNull
      || col("sample_name").isNotNull || col("gt").isNotNull
      || col("zygosity").isNotNull).isEmpty,
      "sites-only rows must have null sample fields")
    def rows(df: org.apache.spark.sql.DataFrame, freq: org.apache.spark.sql.Column) =
      df.select(col("chromosome"), col("position"), col("reference"),
          col("observed"), freq.cast("long").as("freq_ppm"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSet
    val e = rows(expected, col("freq_ppm"))
    assert(e.nonEmpty)
    assert(rows(parsed, element_at(col("info"), "FREQ_PPM")) == e)
    // spot-check line format and the header part
    val line = spark.read.text(out).filter(!col("value").startsWith("#"))
      .first().getString(0)
    assert(line.split("\t").length == 8 && line.contains("FREQ_PPM="))
    val hdr = spark.read.text(out).filter(col("value").startsWith("#"))
      .collect().map(_.getString(0))
    assert(hdr.exists(_.startsWith("##fileformat"))
      && hdr.exists(_.startsWith("#CHROM")))
  }

  test("multi-sample file missing its #CHROM header keeps rows, null names") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "hdrless")
    java.nio.file.Files.write(dir.resolve("part0.vcf"),
      "1\t100\tv1\tA\tT\t.\tPASS\tSUP=1\tGT\t0/1\t1/1\n".getBytes)
    val got = Vcf.parseVcfLines(spark.read.text(dir.toString))
    assert(got.count() == 2, "headerless data file must not lose rows")
    assert(got.collect().forall(r => r.getAs[String]("sample_name") == null
      && r.getAs[String]("gt") != null))
  }

  test("chromosome normalization: chr prefix stripped, M -> MT") {
    import spark.implicits._
    val in = Seq("chr1", "CHR2", "X", "M", "chrM", "MT", "chr22", "m")
    val got = in.toDF("c")
      .select(Normalize.normalizeChromosome(col("c")))
      .collect().map(_.getString(0)).toSeq
    assert(got == in.map(Normalize.normalizeChromosomeRef))
    assert(got == Seq("1", "2", "X", "MT", "MT", "MT", "22", "MT"))
  }

  test("`*` selector matches every sample") {
    import spark.implicits._
    val ids = (0L to 19L).toDF("sample_id")
    val tags = Map("even" -> (col("sample_id") % 2 === 0))
    assert(ids.filter(ExprLang.parse("*", tags)).count() == 20)
    assert(ids.filter(ExprLang.parse("* AND NOT even", tags)).count() == 10)
  }
}
