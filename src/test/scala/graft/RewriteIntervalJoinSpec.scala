package graft

import graft.plans.RewriteIntervalJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The opt-in Catalyst rewrite: a naive point-in-interval join becomes the
  * UCSC-binned equi-join, result-identical and no longer quadratic per key
  * group. */
class RewriteIntervalJoinSpec extends AnyFunSuite {
  import TestSpark._

  private val rnd = new Random(7)

  private def naiveJoin(points: DataFrame, regions: DataFrame): DataFrame =
    points.join(regions,
      points("chromosome") === regions("chromosome")
        && points("position") >= regions("begin_pos")
        && points("position") <= regions("end_pos"))
      .select(points("obs_id"), regions("region_id"))

  private def data() = {
    import spark.implicits._
    val regions = (1 to 400).map { i =>
      val b = rnd.nextLong(1L << 28)
      (i.toLong, (1 + rnd.nextInt(4)).toString, b, b + rnd.nextLong(1L << 20))
    }.toDF("region_id", "chromosome", "begin_pos", "end_pos")
    val points = (1 to 400).map { i =>
      (i.toLong, (1 + rnd.nextInt(4)).toString, rnd.nextLong(1L << 28))
    }.toDF("obs_id", "chromosome", "position")
    (points, regions)
  }

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations = Seq(RewriteIntervalJoin)
    spark.conf.set("spark.graft.rewriteIntervalJoin", "true")
    try f finally {
      spark.conf.unset("spark.graft.rewriteIntervalJoin")
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("rewrites the naive interval join into a binned equi-join") {
    val (points, regions) = data()
    val joined = naiveJoin(points, regions)
    val before = joined.queryExecution.optimizedPlan.toString
    assert(!before.contains("__graft_bin"))
    withRule {
      val after = naiveJoin(points, regions).queryExecution.optimizedPlan.toString
      assert(after.contains("__graft_bin_p") && after.contains("__graft_bin_i"),
        s"rule did not fire:\n$after")
      assert(after.contains("explode"), s"no candidate-bin explode:\n$after")
    }
  }

  test("rewritten join returns exactly the naive result") {
    val (points, regions) = data()
    val expected = naiveJoin(points, regions).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = withRule {
      naiveJoin(points, regions).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(expected.nonEmpty)
    assert(got == expected,
      s"missing=${expected.diff(got).take(5)} extra=${got.diff(expected).take(5)}")
  }

  test("fires regardless of predicate order (upper bound written first)") {
    val (points, regions) = data()
    // upper-bound-first: p <= hi AND p >= lo — round-1 binding bug made
    // the rewrite silently never fire for this orientation. Build the
    // frame fresh per run: queryExecution is a cached lazy val.
    def joined() = points.join(regions,
      points("chromosome") === regions("chromosome")
        && points("position") <= regions("end_pos")
        && points("position") >= regions("begin_pos"))
      .select(points("obs_id"), regions("region_id"))
    val expected = joined().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withRule {
      val fresh = joined()
      val after = fresh.queryExecution.optimizedPlan.toString
      assert(after.contains("__graft_bin_p"), s"rule did not fire:\n$after")
      val got = fresh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    }
  }

  test("left outer interval join rewrites with null-extension preserved") {
    val (points, regions) = data()
    def louter() = points.join(regions,
      points("chromosome") === regions("chromosome")
        && points("position") >= regions("begin_pos")
        && points("position") <= regions("end_pos"),
      "left_outer")
      .select(points("obs_id"), regions("region_id"))
    val expected = louter().collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length }
    assert(expected.exists(_._1._2 == -1L), "fixture needs unmatched points")
    withRule {
      val fresh = louter()
      val after = fresh.queryExecution.optimizedPlan.toString
      assert(after.contains("__graft_bin_p"), s"rule did not fire:\n$after")
      assert(after.contains("Union") && after.contains("LeftAnti"),
        s"no anti/union null-extension shape:\n$after")
      // bag semantics: compare with multiplicity, not as a set
      val got = fresh.collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .groupBy(identity).map { case (k, v) => k -> v.length }
      assert(got == expected)
    }
  }

  test("left semi / left anti interval joins rewrite to binned membership") {
    val (points, regions) = data()
    for (jt <- Seq("left_semi", "left_anti")) {
      def jq() = points.join(regions,
        points("chromosome") === regions("chromosome")
          && points("position") >= regions("begin_pos")
          && points("position") <= regions("end_pos"), jt)
      // bag semantics: duplicate left rows must all pass or all miss
      def dup(df: DataFrame) = df.unionAll(df.filter(df("obs_id") % 3 === 0))
      val expected = dup(jq()).collect().map(_.toSeq).groupBy(identity)
        .map { case (k, v) => k -> v.length }
      withRule {
        val fresh = points.join(regions,
          points("chromosome") === regions("chromosome")
            && points("position") >= regions("begin_pos")
            && points("position") <= regions("end_pos"), jt)
        val after = fresh.queryExecution.optimizedPlan.toString
        assert(after.contains("__graft_bin_p") && after.contains("__graft_mk_"),
          s"$jt rule did not fire:\n$after")
        val got = dup(fresh).collect().map(_.toSeq).groupBy(identity)
          .map { case (k, v) => k -> v.length }
        assert(got == expected, s"$jt mismatch")
      }
    }
    // sanity: fixture exercises both sides of the membership split
    val n = points.count()
    val ns = withRule { points.join(regions,
      points("chromosome") === regions("chromosome")
        && points("position") >= regions("begin_pos")
        && points("position") <= regions("end_pos"), "left_semi").count() }
    assert(ns > 0 && ns < n, s"degenerate fixture: $ns of $n points covered")
  }

  test("semi rewrite keeps NULL-position rows out; anti keeps them") {
    import spark.implicits._
    val points = Seq((1L, "1", Some(150L)), (2L, "1", None), (3L, "1", Some(999L)))
      .toDF("obs_id", "chromosome", "position")
    val regions = Seq((1L, "1", 100L, 200L))
      .toDF("region_id", "chromosome", "begin_pos", "end_pos")
    def jq(jt: String) = points.join(regions,
      points("chromosome") === regions("chromosome")
        && points("position") >= regions("begin_pos")
        && points("position") <= regions("end_pos"), jt)
    withRule {
      assert(jq("left_semi").collect().map(_.getLong(0)).toSet == Set(1L))
      assert(jq("left_anti").collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    }
  }

  test("declared maxLength selects the single fine-bucket level") {
    val (points, regions) = data()  // lengths < 2^20 by construction
    val expected = naiveJoin(points, regions).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    withRule {
      spark.conf.set("spark.graft.intervalJoin.maxLength", (1L << 20).toString)
      try {
        val fresh = naiveJoin(points, regions)
        val after = fresh.queryExecution.optimizedPlan.toString
        assert(after.contains("__graft_bin_p"), s"rule did not fire:\n$after")
        assert(after.contains("array_distinct"),
          s"hierarchy path used despite maxLength (no ≤2-bucket explode):\n$after")
        val got = fresh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == expected)
      } finally spark.conf.unset("spark.graft.intervalJoin.maxLength")
    }
  }

  test("left outer + maxLength compose") {
    val (points, regions) = data()
    def louter() = points.join(regions,
      points("chromosome") === regions("chromosome")
        && points("position") >= regions("begin_pos")
        && points("position") <= regions("end_pos"),
      "left_outer")
      .select(points("obs_id"), regions("region_id"))
    val expected = louter().collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length }
    withRule {
      spark.conf.set("spark.graft.intervalJoin.maxLength", (1L << 20).toString)
      try {
        val fresh = louter()
        val after = fresh.queryExecution.optimizedPlan.toString
        assert(after.contains("array_distinct") && after.contains("LeftAnti"),
          s"composed shape missing:\n$after")
        val got = fresh.collect()
          .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
          .groupBy(identity).map { case (k, v) => k -> v.length }
        assert(got == expected)
      } finally spark.conf.unset("spark.graft.intervalJoin.maxLength")
    }
  }

  test("interval-overlap join rewrites to the bucketed emit-once equi-join") {
    import spark.implicits._
    val a = (1 to 300).map { i =>
      val b = rnd.nextLong(1L << 28)
      (i.toLong, (1 + rnd.nextInt(4)).toString, b, b + rnd.nextLong(1L << 20))
    }.toDF("a_id", "chromosome", "a_begin", "a_end")
    val bT = (1 to 300).map { i =>
      val b = rnd.nextLong(1L << 28)
      (i.toLong, (1 + rnd.nextInt(4)).toString, b, b + rnd.nextLong(1L << 20))
    }.toDF("b_id", "chromosome", "b_begin", "b_end")
    // the naive overlap join: key equality + b1 <= e2 AND b2 <= e1
    def overlap() = a.join(bT,
      a("chromosome") === bT("chromosome")
        && a("a_begin") <= bT("b_end") && bT("b_begin") <= a("a_end"))
      .select(a("a_id"), bT("b_id"))
    // NULL-bound variant: the naive join drops such rows (three-valued
    // comparison); the rewritten path must too — explode of the null
    // bucket sequence yields no rows, same verdict
    val aN = a.withColumn("a_begin",
      when(a("a_id") % 7 === 0, null).otherwise(a("a_begin")))
    def overlapN() = aN.join(bT,
      aN("chromosome") === bT("chromosome")
        && aN("a_begin") <= bT("b_end") && bT("b_begin") <= aN("a_end"))
      .select(aN("a_id"), bT("b_id"))
    // MULTISET expectation: emit-once must not dedup genuine duplicates
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length }
    val expected = key(overlap())
    val expectedN = key(overlapN())
    assert(expected.nonEmpty)
    assert(expectedN.keySet.forall(_._1 % 7 != 0))
    withRule {
      // inert WITHOUT the length promise: per-side fan-out is unbounded
      val noLen = overlap().queryExecution.optimizedPlan.toString
      assert(!noLen.contains("__graft_obin"),
        s"overlap rewrite fired without maxLength:\n$noLen")
      spark.conf.set("spark.graft.intervalJoin.maxLength", (1L << 20).toString)
      try {
        val fresh = overlap()
        val after = fresh.queryExecution.optimizedPlan.toString
        assert(after.contains("__graft_obin_l") && after.contains("__graft_obin_r"),
          s"overlap rewrite did not fire:\n$after")
        assert(key(fresh) == expected)
        assert(key(overlapN()) == expectedN, "null-bound rows diverged")
      } finally spark.conf.unset("spark.graft.intervalJoin.maxLength")
    }
  }

  test("GraftExtensions injects the rule via the extensions path") {
    import org.apache.spark.sql.SparkSession
    // the cluster deployment path exercised in-JVM: `spark.sql.extensions`
    // is read from the SparkContext conf at FIRST context creation (i.e.
    // spark-submit --conf), so an in-process test registers the same class
    // through builder.withExtensions — identical injection surface
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.plans.GraftExtensions)
        .config("spark.graft.rewriteIntervalJoin", "true")
        .getOrCreate()
      assert(s2.sessionState.optimizer.batches.exists(
          _.rules.exists(_.ruleName.contains("RewriteIntervalJoin"))),
        "optimizer does not carry the injected rule")
      assert(s2 ne spark, "expected a fresh session with the extension")
      import s2.implicits._
      val regions = Seq((1L, "1", 100L, 200L))
        .toDF("region_id", "chromosome", "begin_pos", "end_pos")
      val points = Seq((1L, "1", 150L), (2L, "1", 500L))
        .toDF("obs_id", "chromosome", "position")
      val j = points.join(regions,
        points("chromosome") === regions("chromosome")
          && points("position") >= regions("begin_pos")
          && points("position") <= regions("end_pos"))
        .select(points("obs_id"), regions("region_id"))
      assert(j.queryExecution.optimizedPlan.toString.contains("__graft_bin_p"),
        "extension-registered rule did not fire")
      assert(j.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        == Set((1L, 1L)))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("rule is inert when the conf flag is off or shape doesn't match") {
    val (points, regions) = data()
    spark.experimental.extraOptimizations = Seq(RewriteIntervalJoin)
    try {
      val off = naiveJoin(points, regions).queryExecution.optimizedPlan.toString
      assert(!off.contains("__graft_bin"))
      spark.conf.set("spark.graft.rewriteIntervalJoin", "true")
      // plain equi-join: no range pair → untouched
      val equi = points.join(regions, Seq("chromosome"))
        .queryExecution.optimizedPlan.toString
      assert(!equi.contains("__graft_bin"))
    } finally {
      spark.conf.unset("spark.graft.rewriteIntervalJoin")
      spark.experimental.extraOptimizations = Nil
    }
  }
}
