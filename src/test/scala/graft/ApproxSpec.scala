package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tolerance tests for the no-oracle keys (SURVEY.md §5.2): approximate
  * operators are checked against their exact counterparts. */
class ApproxSpec extends AnyFunSuite {
  import TestSpark._

  test("agg_approx_quantile within rank tolerance of exact percentiles") {
    val approx = ops.Aggs.aggApproxQuantile(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // exact quantiles per group via full sort (the thing the sketch avoids)
    val exact = Tables.events(spark, sf001)
      .groupBy("event_type")
      .agg(expr("percentile(value, array(0.5, 0.95, 0.99))").as("q"))
      .select(col("event_type"), col("q")(0), col("q")(1), col("q")(2))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(approx.keySet == exact.keySet)
    // accuracy=10000 bounds rank error at 1/10000; on ~200 rows/group the
    // sketch is exact up to interpolation — allow 2% of the value range
    val span = Tables.events(spark, sf001)
      .agg(max(col("value")) - min(col("value"))).collect()(0).getDouble(0)
    for ((k, (a50, a95, a99)) <- approx; (e50, e95, e99) = exact(k)) {
      assert(math.abs(a50 - e50) <= 0.02 * span, s"$k p50: $a50 vs $e50")
      assert(math.abs(a95 - e95) <= 0.02 * span, s"$k p95: $a95 vs $e95")
      assert(math.abs(a99 - e99) <= 0.02 * span, s"$k p99: $a99 vs $e99")
    }
  }

  test("agg_approx_hll within 5% of exact distinct counts") {
    val approx = ops.Aggs.aggApproxHll(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ops.Aggs.aggCountDistinct(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, e) <- exact) {
      val a = approx(k).toDouble
      assert(math.abs(a - e) / e <= 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("agg_hll_merge: merged monthly partials == one-shot sketch == exact count") {
    val merged = ops.Aggs.aggHllMerge(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the mergeability contract: unioning per-month partials must lose
    // nothing vs sketching the whole column in one pass
    val oneshot = Tables.events(spark, sf001)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(day, 12))").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // and the calendar-bounded domain keeps the sketch in its exact
    // regime (the declared key's oracle relies on this)
    val exact = Tables.events(spark, sf001)
      .select(col("event_type"), to_date(col("ts")).as("d"))
      .groupBy("event_type").agg(countDistinct(col("d")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == oneshot, s"merge lost coupons: $merged vs $oneshot")
    assert(merged == exact, s"sketch left exact regime: $merged vs $exact")
    // PRECONDITION PIN (round-16 ADVICE): the key's FULL hash oracle is
    // exact only while distinct days per type stays inside the lgK=12
    // coupon regime (~hundreds). If a future fixture/GenScale change
    // widens the event time span past this bound, fail HERE with a
    // named cause instead of intermittently at the Verify sweep.
    exact.foreach { case (k, n) =>
      assert(n <= 256, s"agg_hll_merge precondition broken: event_type " +
        s"'$k' spans $n distinct days — past ~hundreds the lgK=12 sketch " +
        "leaves its exact coupon regime and the key's hash oracle goes " +
        "flaky. Narrow the fixture's time span or demote the key to " +
        "tolerance-only.")
    }
  }

  test("agg_hll_partials: the persisted-partials answer is exact, the " +
      "table is O(slices × groups), and serving never rescans events") {
    val got = ops.Aggs.aggHllPartials(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf001)
      .select(date_format(col("ts"), "yyyy-MM").as("month"),
        to_date(col("ts")).as("d"))
      .groupBy("month").agg(countDistinct(col("d")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, s"partials-served answer diverged: $got vs $exact")
    // the partials table holds ONE row per (slice, group) — the
    // persisted surface a later re-aggregation reads instead of history
    val dir = ops.Scans.scratch(spark, "hll_partials", sf001)
    val nPartials = spark.read.parquet(dir).count()
    val nSliceGroups = Tables.events(spark, sf001)
      .select(date_format(col("ts"), "yyyy-MM").as("month"), col("event_type"))
      .distinct().count()
    assert(nPartials == nSliceGroups,
      s"partials table is not O(slices × groups): $nPartials vs $nSliceGroups")
    // and the SERVING plan scans the partials directory, never the
    // events history (the no-rescan contract)
    val plan = ops.Aggs.aggHllPartials(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("events.parquet"),
      "the serving query rescanned the events history")
    assert(plan.contains("hll_partials"),
      "the serving query did not read the persisted partials table")
  }

  test("jaccardPairs df-cap: no-cap equals the declared exact set; a cap only removes pairs") {
    val docs = Tables.documents(spark, sf001)
    def pairs(maxDf: Int) = ops.Llm.jaccardPairs(docs, maxDf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ops.Llm.dedupNearJaccard(spark, sf001)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(Int.MaxValue) == exact)
    val capped = pairs(3)
    assert(capped.subsetOf(exact),
      s"cap invented pairs: ${capped.diff(exact).take(5)}")
  }

  test("dedup_near_minhash recall >= 0.9 vs exact jaccard pairs") {
    val exact = ops.Llm.dedupNearJaccard(spark, sf001)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "no exact near-dup pairs at sf0.01 — fixture changed?")
    val approx = ops.Llm.dedupNearMinhash(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    info(s"minhash recall = $recall over ${exact.size} true pairs")
    assert(recall >= 0.9, s"recall $recall < 0.9")
  }

  test("sim_ann_lsh recall vs exact cosine top-5") {
    val exact = ops.Llm.simTopkCosine(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = ops.Llm.simAnnLsh(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    info(s"ann-lsh recall = $recall over ${exact.size} exact neighbor pairs")
    // round 18: multi-probe + the 0.35 design cosine lifted measured
    // recall 0.73 → 0.912 on this fixture (deterministic — sign-LSH
    // buckets are hash arithmetic, no fitted model), so the floor moves
    // to the production bar the round-17 verdict asked for
    assert(recall >= 0.9, s"recall $recall < 0.9")
  }

  test("sim_ann_ivf recall vs exact cosine top-5") {
    val exact = ops.Llm.simTopkCosine(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = ops.Llm.simAnnIvf(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    info(s"ann-ivf recall = $recall over ${exact.size} exact neighbor pairs")
    assert(recall >= 0.5, s"recall $recall < 0.5")
  }

  test("dedup_near_embedding_lsh: recall 1.0 on planted near-identical pairs") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    // plant one near-identical partner per vector (x + 0.15·reverse(x):
    // cosine >= 0.98 by construction); precision is structural (exact
    // verify), so set equality against the exact kernel at the same
    // DECIMAL threshold == recall 1.0 on a non-vacuous pair set
    val e = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val pert = e.select((col("vec_id") + 1000000).as("vec_id"),
      expr("""transform(zip_with(embedding, reverse(embedding),
                (a, b) -> a + 0.15f * b), x -> cast(x as float))""")
        .as("embedding"))
    val all = e.unionByName(pert)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(ops.Llm.allPairsCosine(spark, all)
      .select(col("id1").as("d1"), col("id2").as("d2"),
        col("cos").cast(DecimalType(18, 6)).as("cos_d"))
      .filter(col("cos_d") >= lit(BigDecimal("0.900000")).cast(DecimalType(18, 6)))
      .select("d1", "d2"))
    val lsh = pairSet(ops.Analysis.nearIdenticalLsh(all))
    assert(exact.size >= e.count(),
      s"planting failed: only ${exact.size} exact pairs")
    assert(lsh == exact,
      s"missed=${exact.diff(lsh).take(5)} extra=${lsh.diff(exact).take(5)}")
    info(s"lsh pair set equals exact (${exact.size} pairs)")
    // the DECLARED key plants one clone per vec_id ≡ 0 (mod 97) at
    // cosine ≈ 0.9999 (round 16 — the raw corpus holds no >= 0.9 pair,
    // so the unplanted key certified an empty frame): its output must
    // be EXACTLY the (original, clone) pairs — every planted pair found
    // (recall 1.0 on the declared fixture), nothing else (structural
    // precision + clones of different originals stay dissimilar)
    val declared = pairSet(ops.Analysis.dedupNearEmbeddingLsh(spark, sf001))
    val expected = Tables.embeddings(spark, sf001)
      .filter(col("vec_id") % ops.Analysis.PlantStride === 0)
      .select("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + ops.Analysis.PlantOffset))
      .toSet
    assert(expected.nonEmpty, "the planted fixture must be non-vacuous")
    assert(declared == expected,
      s"missed=${expected.diff(declared).take(5)} " +
        s"extra=${declared.diff(expected).take(5)}")
    info(s"declared key carries the ${expected.size} planted pairs")
  }

  test("stream_late_watermark drops exactly the late rows") {
    val out = ops.Streaming.streamLateWatermark(spark, sf001)
      .agg(sum("n_kept")).collect()(0).getLong(0)
    val total = Tables.events(spark, sf001).count()
    assert(out <= total)
    assert(out > 0)
    info(s"kept $out of $total events after watermark emulation")
  }
}
