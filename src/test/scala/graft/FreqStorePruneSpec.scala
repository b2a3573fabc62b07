package graft

import graft.sources.FreqStoreScanBuilder
import org.apache.spark.sql.sources._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Soundness of the freqstore scan's bucket pruning: whenever
  * `pointSet(filters)` claims the filter implies (chromosome, position)
  * ∈ S, EVERY row satisfying the filter must have its point in S —
  * because pruned-away buckets are never scanned and the residual
  * filters cannot resurrect their rows, an unsound extraction is silent
  * row loss, not a slow plan. Brute-forced over random filter trees in
  * the source's grammar (and beyond it: unrelated attributes,
  * GreaterThan, Not — which must simply yield "no pruning" or stay
  * sound). */
class FreqStorePruneSpec extends AnyFunSuite {

  private val chroms = Seq("1", "2", "X")
  private val poss = Seq(1000L, 2000L, 3000L)

  private def genFilter(depth: Int): Gen[Filter] = {
    val leaf: Gen[Filter] = Gen.oneOf(
      Gen.oneOf(chroms).map(c => EqualTo("chromosome", c)),
      Gen.oneOf(poss).map(p => EqualTo("position", p)),
      Gen.oneOf(poss).map(p => EqualTo("position", java.lang.Long.valueOf(p))),
      Gen.someOf(poss).map(ps => In("position", ps.toArray.map(_.asInstanceOf[Any]))),
      Gen.oneOf(poss).map(p => GreaterThan("position", p)),
      Gen.oneOf(chroms).map(c => EqualTo("reference", c)), // unrelated attr
      Gen.const(IsNotNull("chromosome")))
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> (for (l <- genFilter(depth - 1); r <- genFilter(depth - 1))
        yield And(l, r)),
      2 -> (for (l <- genFilter(depth - 1); r <- genFilter(depth - 1))
        yield Or(l, r)),
      1 -> genFilter(depth - 1).map(Not))
  }

  /** Evaluate a filter over a synthetic row: the declared point plus a
    * fixed reference value (enough for the grammar above). */
  private def eval(f: Filter, chrom: String, pos: Long): Boolean = f match {
    case EqualTo("chromosome", v) => chrom == v
    case EqualTo("position", v: java.lang.Number) => pos == v.longValue()
    case EqualTo("reference", v) => "A" == v
    case EqualTo(_, _) => false
    case In("position", vs) => vs.exists {
      case n: java.lang.Number => n.longValue() == pos
      case _ => false
    }
    case In(_, _) => false
    case GreaterThan("position", v: java.lang.Number) => pos > v.longValue()
    case GreaterThan(_, _) => false
    case IsNotNull(_) => true
    case And(l, r) => eval(l, chrom, pos) && eval(r, chrom, pos)
    case Or(l, r) => eval(l, chrom, pos) || eval(r, chrom, pos)
    case Not(c) => !eval(c, chrom, pos)
    case other => sys.error(s"unexpected filter $other")
  }

  test("pointSet is sound: a claimed point set covers every matching row") {
    val gen = Gen.listOfN(3, genFilter(2))
    var pruned = 0
    for (i <- 0 until 1000) {
      val fs = gen.apply(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(Nil)
      FreqStoreScanBuilder.pointSet(fs.toArray).foreach { claimed =>
        pruned += 1
        for (c <- chroms ++ Seq("7"); p <- poss ++ Seq(9999L))
          if (fs.forall(eval(_, c, p)))
            assert(claimed.contains((c, p)),
              s"filters $fs match ($c, $p) but pointSet claimed only $claimed")
      }
    }
    assert(pruned > 20, s"property vacuous: only $pruned pruning cases hit")
  }

  test("the flagship shapes are recognized (pruning actually fires)") {
    assert(FreqStoreScanBuilder.pointSet(Array(
      EqualTo("chromosome", "1"), EqualTo("position", 5000L)))
      .contains(Set(("1", 5000L))))
    assert(FreqStoreScanBuilder.pointSet(Array(
      Or(And(EqualTo("chromosome", "1"), EqualTo("position", 1L)),
        And(EqualTo("chromosome", "2"), EqualTo("position", 2L)))))
      .contains(Set(("1", 1L), ("2", 2L))))
    assert(FreqStoreScanBuilder.pointSet(Array(
      EqualTo("chromosome", "1"),
      In("position", Array(1L, 2L).map(_.asInstanceOf[Any]))))
      .contains(Set(("1", 1L), ("1", 2L))))
    // underdetermined → must NOT prune
    assert(FreqStoreScanBuilder.pointSet(Array(
      EqualTo("chromosome", "1"))).isEmpty)
    assert(FreqStoreScanBuilder.pointSet(Array(
      EqualTo("position", 5L))).isEmpty)
  }
}
