package graft

import graft.varda.VardaOps
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for [[VardaOps.denovoFrom]] with crafted trio rows —
  * each exclusion rule gets a planted counterexample (the fixture corpus
  * exercises the coverage clause but parents essentially never share a
  * child variant, so inheritance exclusion needs planting here). */
class TrioSpec extends AnyFunSuite {
  import TestSpark._

  // trio under test: child 12, father 14, mother 16 (child ≡ 4 mod 8)
  private def obsRow(id: Long, pos: Long, sid: Long, zyg: String,
      ref: String = "A", alt: String = "C") =
    (id, "1", pos, ref, alt, sid, 1, zyg)

  test("denovo keeps exactly the child-het variant absent in both covered parents") {
    import spark.implicits._
    val obs = Seq(
      // A: candidate — child het, parents silent, both covered
      obsRow(1, 1000L, 12L, "heterozygous"),
      // B: father carries the same variant -> inherited, excluded
      obsRow(2, 1200L, 12L, "heterozygous"),
      obsRow(3, 1200L, 14L, "homozygous"),
      // C: father has a coverage profile but no region at 3000 -> missing
      // data, excluded
      obsRow(4, 3000L, 12L, "heterozygous"),
      // D: child homozygous -> not a de-novo candidate shape
      obsRow(5, 1400L, 12L, "homozygous")
    ).toDF("obs_id", "chromosome", "position", "reference", "observed",
      "sample_id", "support", "zygosity")
    // father 14 covers [500, 1500] only; mother 16 has NO coverage profile
    // and therefore covers everything (the frequency-denominator rule)
    val cov = Seq((20L, "1", 500L, 1500L, 14L, 1))
      .toDF("region_id", "chromosome", "begin_pos", "end_pos",
        "sample_id", "pool_size")
    val smp = Seq((12L, 1, true), (14L, 1, true), (16L, 1, false))
      .toDF("sample_id", "pool_size", "has_coverage")

    val out = VardaOps.denovoFrom(obs, cov, smp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq(("1", 1000L, "A", "C", 12L)))
  }
}
