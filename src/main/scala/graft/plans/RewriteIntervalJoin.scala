package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi}
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
  *
  * Round-8 extension — **LEFT SEMI / LEFT ANTI** (the containment-
  * existence shapes: "points inside any region" / "points outside every
  * region" — what `varda_trio_denovo`'s coverage gate and
  * `text_decontaminate` hand-build): both reduce to one binned-inner
  * join aggregated to the DISTINCT matched left-side condition tuples,
  * then a plain equi semi/anti join of the untouched left against those
  * tuples. Whether a left row matches depends only on its condition
  * columns, so the value-level membership test preserves bag semantics
  * exactly (duplicate left rows all match or all miss), and NULL
  * condition columns never equal a matched tuple — null-point rows are
  * dropped by SEMI and kept by ANTI, exactly the naive behavior.
  *
  * Round-9 extension — **interval × interval OVERLAP** (inner-join
  * shape `… AND b1 <= e2 AND b2 <= e1`, the bedtools-intersect join):
  * both sides explode into their covering fine buckets and each
  * overlapping pair is emitted exactly once from the bucket holding
  * `greatest(b1, b2)` — see [[overlapBinned]]. Requires the `maxLength`
  * promise below (bounded per-side fan-out).
  *
  * Two round-7 extensions:
  *
  *  - **LEFT OUTER** (the annotation shape — every input variant kept,
  *    matched or not): rewritten as binned-inner(matched pairs) UNION
  *    (preserved-side rows anti-joined against the DISTINCT matched key
  *    tuples, null-extended). The anti join is an equi-join on the
  *    preserved side's condition columns — never quadratic — and bag
  *    semantics hold because whether a row matches depends only on
  *    those columns.
  *  - **Bounded interval length** via `spark.graft.intervalJoin
  *    .maxLength=N`: when every interval is guaranteed no longer than N,
  *    a single fine bucket level (size = smallest 2^s > N) replaces the
  *    5-level hierarchy — the interval side explodes to its ≤2 covering
  *    buckets and the point side probes ONE bucket (no 5× point
  *    fan-out), the [[graft.varda.VardaOps.bucketedContainment]] plan
  *    chosen by the optimizer instead of hand-written. The length bound
  *    is the caller's promise (same opt-in contract as the rule itself);
  *    it also lifts the 2^29 position ceiling — bucket arithmetic is
  *    plain shiftright at any magnitude.
  *
  * RewriteIntervalJoinSpec proves plan shape + result equivalence on
  * randomized data for all paths.
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

  /** Fine-bucket shift from the declared max interval length: smallest s
    * with 2^s > maxLength, so an interval spans at most two buckets. */
  private def maxLengthShift: Option[Int] =
    conf.getConfString("spark.graft.intervalJoin.maxLength", "") match {
      case "" => None
      case s => scala.util.Try(s.toLong).toOption.filter(_ > 0)
        .map(n => 64 - java.lang.Long.numberOfLeadingZeros(n))
    }

  def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled(plan)) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        binned(left, right, cond)
          .orElse(overlapBinned(left, right, cond))
          .map { case (nl, nr, newCond) =>
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
          }.getOrElse(j)
      case j @ Join(left, right, LeftOuter, Some(cond), hint) =>
        rewriteLeftOuter(j, left, right, cond, hint).getOrElse(j)
      case j @ Join(left, right, LeftSemi, Some(cond), hint) =>
        rewriteSemiAnti(j, left, right, cond, hint, LeftSemi).getOrElse(j)
      case j @ Join(left, right, LeftAnti, Some(cond), hint) =>
        rewriteSemiAnti(j, left, right, cond, hint, LeftAnti).getOrElse(j)
    }
  }

  /** SEMI/ANTI = membership of the left row's condition tuple in the
    * DISTINCT matched tuples of the binned inner join. The outer
    * semi/anti is a plain equi-join (hashable, broadcastable when the
    * matched-tuple set is small — the usual case for containment
    * gates), and the left side is passed through UNTOUCHED, so
    * multiplicity and non-condition columns are preserved by
    * construction. */
  private def rewriteSemiAnti(j: Join, left: LogicalPlan,
      right: LogicalPlan, cond: Expression, hint: JoinHint,
      joinType: JoinType): Option[LogicalPlan] =
    binned(left, right, cond).map { case (nl, nr, newCond) =>
      val inner = Join(nl, nr, Inner, Some(newCond), hint)
      val keyAttrs = cond.references.intersect(left.outputSet).toSeq
      val mkAliases = keyAttrs.map(a => Alias(a, s"__graft_mk_${a.name}")())
      val matchedKeys = Aggregate(keyAttrs, mkAliases, inner)
      val memberCond = keyAttrs.zip(mkAliases)
        .map { case (a, mk) => EqualTo(a, mk.toAttribute) }
        .reduce[Expression](And)
      Join(left, matchedKeys, joinType, Some(memberCond), JoinHint.NONE)
    }

  /** LEFT OUTER = binned-inner matched pairs ∪ null-extended unmatched
    * left rows. Unmatched = left ANTI equi-join against the distinct
    * matched left-side key tuples (whether a left row matches depends
    * only on its condition columns, so value-level subtraction preserves
    * bag semantics — duplicate left rows all match or all miss). NULL
    * condition columns never equal a matched tuple, so those rows are
    * kept null-extended, exactly as the naive outer join treats them. */
  private def rewriteLeftOuter(j: Join, left: LogicalPlan,
      right: LogicalPlan, cond: Expression, hint: JoinHint)
      : Option[LogicalPlan] =
    binned(left, right, cond).map { case (nl, nr, newCond) =>
      val inner = Join(nl, nr, Inner, Some(newCond), hint)
      val matched = Project(left.output ++ right.output, inner)
      val keyAttrs = cond.references.intersect(left.outputSet).toSeq
      val mkAliases = keyAttrs.map(a => Alias(a, s"__graft_mk_${a.name}")())
      val matchedKeys = Aggregate(keyAttrs, mkAliases, inner)
      val antiCond = keyAttrs.zip(mkAliases)
        .map { case (a, mk) => EqualTo(a, mk.toAttribute) }
        .reduce[Expression](And)
      val anti = Join(left, matchedKeys, LeftAnti, Some(antiCond), JoinHint.NONE)
      val nullRight = j.output.drop(left.output.length).map(a =>
        Alias(Literal.create(null, a.dataType), a.name)(exprId = a.exprId))
      Union(matched, Project(left.output ++ nullRight, anti))
    }

  private def refsOf(e: Expression): AttributeSet = e.references

  /** Detect the point-in-interval shape in `cond` and build the binned
    * equi-join sides: (newLeft, newRight, cond ∧ binEquality). Hierarchy
    * path: point side explodes 5 candidate bins, interval side computes
    * assign_bin. maxLength path: interval side explodes its ≤2 covering
    * fine buckets, point side computes its single bucket. */
  private def binned(left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[(LogicalPlan, LogicalPlan, Expression)] = {
    // the rewritten join still matches this pattern (and user-provided
    // optimizer batches run to fixpoint) — the marker stops re-application
    if (cond.references.exists(_.name.startsWith("__graft_"))) return None
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

        val (pointSide, intervalSide, binEq) = maxLengthShift match {
          case Some(sh) =>
            // single fine bucket level: point probes ONE bucket, interval
            // explodes its (≤2 distinct) covering buckets
            val pAlias = Alias(shr(p, sh), "__graft_bin_p")()
            val pproj = Project(pointPlan.output :+ pAlias, pointPlan)
            val iAttr = AttributeReference("__graft_bin_i", LongType)()
            val arr = ArrayDistinct(CreateArray(Seq(shr(lo, sh), shr(hi, sh))))
            val gen = Generate(Explode(arr), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(iAttr),
              child = intervalPlan)
            (pproj: LogicalPlan, gen: LogicalPlan,
              EqualTo(pAlias.toAttribute, iAttr))
          case None =>
            // hierarchy: point explodes its 5 candidate bins, interval
            // computes assign_bin(lo, hi)
            val binArr = CreateArray(candidateBins(p))
            val binAttr = AttributeReference("__graft_bin_p", LongType)()
            val gen = Generate(Explode(binArr), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(binAttr),
              child = pointPlan)
            val binAlias = Alias(assignBin(lo, hi), "__graft_bin_i")()
            val proj = Project(intervalPlan.output :+ binAlias, intervalPlan)
            (gen: LogicalPlan, proj: LogicalPlan,
              EqualTo(binAttr, binAlias.toAttribute))
        }
        val (nl, nr) =
          if (pointOnLeft) (pointSide, intervalSide) else (intervalSide, pointSide)
        (nl, nr, And(cond, binEq))
      }
    }.headOption
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Round-9: the interval × interval OVERLAP shape (the
    * bedtools-intersect join `varda_region_intersect` hand-builds via
    * `bucketedOverlap`):
    *
    *   A ⋈ B ON … AND a.begin <= b.end AND b.begin <= a.end
    *
    * Both sides explode into every fine bucket their interval covers
    * (`sequence(begin >> s, end >> s)`), the join becomes equi on the
    * bucket, and each overlapping pair is emitted EXACTLY ONCE by
    * keeping only the bucket that holds the overlap's start
    * (`greatest(a.begin, b.begin) >> s`) — that bucket lies inside both
    * intervals' ranges precisely when they overlap, so no distinct is
    * needed. Fires only under `spark.graft.intervalJoin.maxLength`
    * (per-side fan-out is then ≤ 2 buckets) and extends the opt-in
    * contract with the well-formedness promise `begin <= end` per
    * interval — the same caller-knowledge class as the length bound.
    * Inner-join shape only (the intersect analytics shape). */
  private def overlapBinned(left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[(LogicalPlan, LogicalPlan, Expression)] = {
    if (cond.references.exists(_.name.startsWith("__graft_"))) return None
    val sh = maxLengthShift.getOrElse(return None)
    val preds = splitConjuncts(cond)
    def sideOf(e: Expression): Option[Boolean] =
      if (refsOf(e).subsetOf(left.outputSet)) Some(true)
      else if (refsOf(e).subsetOf(right.outputSet)) Some(false)
      else None
    def integral(e: Expression): Boolean = {
      import org.apache.spark.sql.types._
      Seq(ByteType, ShortType, IntegerType, LongType).contains(e.dataType)
    }
    // every "x <= y" reading with x and y on opposite sides
    val leqs = preds.zipWithIndex.flatMap {
      case (LessThanOrEqual(x, y), i)
          if sideOf(x).isDefined && sideOf(y).isDefined
            && sideOf(x) != sideOf(y) && integral(x) && integral(y) =>
        Seq((x, y, i))
      case (GreaterThanOrEqual(y, x), i)
          if sideOf(x).isDefined && sideOf(y).isDefined
            && sideOf(x) != sideOf(y) && integral(x) && integral(y) =>
        Seq((x, y, i))
      case _ => Nil
    }
    // Require EXACTLY two cross-side readings: with a third (say
    // a.score <= b.score), which two form the interval bounds is
    // ambiguous from the plan, and a mispairing like (score, end)
    // would explode a bucket sequence the maxLength promise never
    // covered — predicate sets beyond the canonical shape keep the
    // naive plan
    if (leqs.size != 2) return None
    // a pair of readings with opposite begin sides forms the overlap:
    // b1 <= e2 (from side S) with b2 <= e1 (from side T)
    val shapes = for {
      (x1, y1, i) <- leqs.view
      (x2, y2, j) <- leqs.view
      if j != i && sideOf(x1) != sideOf(x2)
      // skip the containment shape (one side's "interval" degenerates
      // to a single expression) — [[binned]]'s point-probe plan is
      // strictly better there and runs first anyway
      if !x1.semanticEquals(y2) && !x2.semanticEquals(y1)
    } yield {
      val (bL, eL, bR, eR) =
        if (sideOf(x1).contains(true)) (x1, y2, x2, y1) else (x2, y1, x1, y2)
      // Sequence is TimeZoneAwareExpression: expressions minted inside
      // the optimizer run AFTER ResolveTimeZone, so the tz must be set
      // here or the plan turns unresolved
      def bucketSeq(b: Expression, e: Expression) =
        Sequence(shr(b, sh), shr(e, sh), None, Some(conf.sessionLocalTimeZone))
      val lAttr = AttributeReference("__graft_obin_l", LongType)()
      val lGen = Generate(
        Explode(bucketSeq(bL, eL)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(lAttr), child = left)
      val rAttr = AttributeReference("__graft_obin_r", LongType)()
      val rGen = Generate(
        Explode(bucketSeq(bR, eR)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(rAttr), child = right)
      val emitOnce = EqualTo(lAttr,
        ShiftRight(Greatest(Seq(Cast(bL, LongType), Cast(bR, LongType))),
          Literal(sh)))
      (lGen: LogicalPlan, rGen: LogicalPlan,
        And(And(cond, EqualTo(lAttr, rAttr)), emitOnce))
    }
    shapes.headOption
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
