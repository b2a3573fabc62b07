package graft

import graft.varda.{Annotate, ExprLang, Normalize, VardaOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Annotation VCF write-back, chromosome normalization, and the `*`
  * selector — the remaining reference-surface pieces. */
class AnnotateSpec extends AnyFunSuite {
  import TestSpark._

  test("annotated VCF text round-trips losslessly") {
    val out = "/root/repo/target/tmp/annotated_vcf"
    Annotate.writeAnnotatedVcf(spark, sf0001, out)
    val expected = VardaOps.vardaAnnotate(spark, sf0001)
    val parsed = Annotate.parseVcfLines(spark.read.text(out))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("chromosome", "position", "reference", "observed", "freq_ppm")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSet
    val e = rows(expected)
    assert(e.nonEmpty)
    assert(rows(parsed) == e)
    // spot-check the line format
    val line = spark.read.text(out).first().getString(0)
    assert(line.split("\t").length == 8 && line.contains("FREQ_PPM="))
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
