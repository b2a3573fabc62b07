package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared key executes at sf0.001 and yields a deterministic,
  * repeatable result (same count twice). The value-level parity gate is
  * the DuckDB oracle (tools/check.py / driver t2); this spec catches
  * runtime regressions fast, including the 4 no-oracle keys. */
class AllQueriesSpec extends AnyFunSuite {
  import TestSpark._

  test("queries and oracleSql keys line up") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without query: ${o.diff(q)}")
    val noOracle = q.diff(o)
    assert(noOracle == Set("agg_approx_hll", "agg_approx_quantile",
      "dedup_near_minhash", "sim_ann_lsh",
      "sim_ann_ivf", "dedup_near_embedding_lsh"),
      s"unexpected no-oracle keys: $noOracle")
    assert(q.size == 139, s"expected 139 declared keys, got ${q.size}")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001 and is deterministic") {
      val df = fn(spark, sf0001)
      val c1 = df.count()
      val c2 = fn(spark, sf0001).count()
      assert(c1 == c2, s"$name row count not stable: $c1 vs $c2")
      // these can legitimately be empty at tiny scale; everything else
      // must produce rows.
      val mayBeEmpty = Set("join_left_anti", "dedup_near_embedding",
        "dedup_near_embedding_lsh")
      if (!mayBeEmpty(name)) assert(c1 > 0, s"$name returned 0 rows")
    }
  }
}
