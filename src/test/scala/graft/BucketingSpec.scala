package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the 100 TB co-located join: both sides pre-partitioned on
  * the join key at write time, so the join needs no shuffle at read time.
  * This spec proves the property end-to-end on real tables: bucketed
  * sort-merge join plans with ZERO Exchange operators and returns the same
  * rows as the shuffled join. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed join is shuffle-free and row-identical to the plain join") {
    val o = Tables.orders(spark, sf0001)
    val c = Tables.customer(spark, sf0001)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    o.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    c.write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bo = spark.table("b_orders"); val bc = spark.table("b_customer")
      val j = bo.join(bc, bo("o_custkey") === bc("c_custkey"))
        .select("o_orderkey", "c_name")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"not an SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        s"bucket pruning metadata missing:\n$plan")
      val expected = o.join(c, o("o_custkey") === c("c_custkey"))
        .select("o_orderkey", "c_name").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val got = j.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("bucketed layout survives a catalog wipe: marker re-registration path") {
    // simulate joinBucketColocated's cross-JVM reuse: after the cold
    // write, drop the catalog entries (what a fresh JVM's in-memory
    // catalog looks like) while the files + fingerprint marker survive;
    // the second call must re-register external bucketed tables and still
    // plan the exchange-free SMJ with identical rows
    val q = SparkEntry.queries("join_bucket_colocated")
    val sfx = sf0001.replaceAll("[^A-Za-z0-9]", "_")
    val cold = q(spark, sf0001).collect().map(_.toString).toSeq
    spark.sql(s"DROP TABLE IF EXISTS b_orders_$sfx")
    spark.sql(s"DROP TABLE IF EXISTS b_customer_$sfx")
    val df = q(spark, sf0001)
    val reused = df.collect().map(_.toString).toSeq
    assert(reused == cold, "re-registered layout returned different rows")
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("SortMergeJoin"), s"not an SMJ after re-registration:\n$p")
    assert(!p.substring(p.indexOf("SortMergeJoin")).contains("Exchange"),
      s"re-registered bucketed join shuffles:\n$p")
    // the external re-registration must also be marked bucketed
    assert(p.contains("SelectedBucketsCount"),
      s"bucket metadata lost on re-registration:\n$p")
  }
}
