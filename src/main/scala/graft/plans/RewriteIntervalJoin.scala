package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** The one custom Catalyst optimization this engine justifies (SURVEY.md
  * §4): rewrite a naive point-in-interval join
  *
  *   A ⋈ B ON a.key = b.key AND a.p >= b.lo AND a.p <= b.hi
  *
  * — which Spark plans as a hash join on `key` alone and evaluates the
  * range residual against every same-key pair (quadratic per key group,
  * the reference's pre-binning problem) — into the UCSC hierarchical
  * bin join (varda/region_binning.py [U]):
  *
  *   explode(A, 5 candidate bins of p) ⋈ B+assign_bin(lo,hi)
  *     ON key, bin  [+ the original range predicates as residual]
  *
  * Bin equality is implied by containment for non-negative positions
  * below 2^29, so the rewrite is semantics-preserving exactly there —
  * hence OPT-IN via `spark.graft.rewriteIntervalJoin=true` (the engine
  * can't prove the domain from the plan; same contract as other
  * bin-size-hinted range joins in production engines).
  * RewriteIntervalJoinSpec proves plan shape + result equivalence on
  * randomized data.
  */
object RewriteIntervalJoin extends Rule[LogicalPlan] {

  private val Levels = Seq((585L, 17), (73L, 20), (9L, 23), (1L, 26), (0L, 29))

  private def shr(e: Expression, n: Int): Expression =
    ShiftRight(Cast(e, LongType), Literal(n))

  /** assign_bin(lo, hi): smallest level where lo and hi share a bin. */
  private def assignBin(lo: Expression, hi: Expression): Expression =
    Levels.init.foldRight[Expression](
      Add(Literal(Levels.last._1), shr(lo, Levels.last._2))) {
      case ((off, sh), elseE) =>
        If(EqualTo(shr(lo, sh), shr(hi, sh)),
          Add(Literal(off), shr(lo, sh)), elseE)
    }

  private def candidateBins(p: Expression): Seq[Expression] =
    Levels.map { case (off, sh) => Add(Literal(off), shr(p, sh)) }

  private def enabled(plan: LogicalPlan): Boolean =
    conf.getConfString("spark.graft.rewriteIntervalJoin", "false") == "true"

  def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled(plan)) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        rewrite(j, left, right, cond, hint).getOrElse(j)
    }
  }

  private def refsOf(e: Expression): AttributeSet = e.references

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint): Option[LogicalPlan] = {
    // the rewritten join still matches this pattern (and user-provided
    // optimizer batches run to fixpoint) — the marker stops re-application
    if (cond.references.exists(_.name.startsWith("__graft_bin"))) return None
    val preds = splitConjuncts(cond)
    // classify: point side has p; interval side has lo/hi
    def sideOf(e: Expression): Option[Boolean] = // true = left
      if (refsOf(e).subsetOf(left.outputSet)) Some(true)
      else if (refsOf(e).subsetOf(right.outputSet)) Some(false)
      else None

    // Every inequality yields one "p >= lo" reading, but which comparison
    // is the lower bound is ambiguous from a single predicate: for a
    // condition written upper-bound-first (a.p <= b.hi AND a.p >= b.lo),
    // the first predicate reads as p := b.hi >= lo := a.p, and no
    // matching upper bound exists for that binding. So collect ALL
    // candidate (p, lo) readings and try each against the remaining
    // predicates — predicate order can no longer decide whether the
    // rewrite fires (round-2 fix).
    val geqCands = preds.zipWithIndex.flatMap {
      case (GreaterThanOrEqual(p, lo), i)
          if sideOf(p).isDefined && sideOf(lo).isDefined && sideOf(p) != sideOf(lo) =>
        Seq((p, lo, i))
      case (LessThanOrEqual(lo, p), i)
          if sideOf(p).isDefined && sideOf(lo).isDefined && sideOf(p) != sideOf(lo) =>
        Seq((p, lo, i))
      case _ => Nil
    }
    geqCands.view.flatMap { case (p, lo, i) =>
      val leq = preds.zipWithIndex.collectFirst {
        case (LessThanOrEqual(p2, hi), k)
            if k != i && p2.semanticEquals(p) && sideOf(hi) == sideOf(lo) => hi
        case (GreaterThanOrEqual(hi, p2), k)
            if k != i && p2.semanticEquals(p) && sideOf(hi) == sideOf(lo) => hi
      }
      leq.filter { _ =>
        // only integral point/bounds (the binning arithmetic domain)
        import org.apache.spark.sql.types._
        Seq(ByteType, ShortType, IntegerType, LongType).contains(p.dataType)
      }.map { hi =>
        val pointOnLeft = sideOf(p).get
        val (pointPlan, intervalPlan) = if (pointOnLeft) (left, right) else (right, left)

        // point side: explode the 5 candidate bins
        val binArr = CreateArray(candidateBins(p))
        val binAttr = AttributeReference("__graft_bin_p", LongType)()
        val gen = Generate(Explode(binArr), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(binAttr),
          child = pointPlan)

        // interval side: compute assign_bin(lo, hi)
        val binAlias = Alias(assignBin(lo, hi), "__graft_bin_i")()
        val proj = Project(intervalPlan.output :+ binAlias, intervalPlan)

        val newCond = And(cond, EqualTo(binAttr, binAlias.toAttribute))
        val (nl, nr) =
          if (pointOnLeft) (gen: LogicalPlan, proj: LogicalPlan)
          else (proj: LogicalPlan, gen: LogicalPlan)
        // restore the original output (drop the helper bin columns)
        Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
      }
    }.headOption
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}

/** Register with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions` — the conf form is
  * read from the SparkContext conf at FIRST context creation (i.e. a
  * spark-submit `--conf`), not from a later session builder's options. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => RewriteIntervalJoin)
}
