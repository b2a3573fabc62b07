package graft

import graft.ops.GlobalRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-pass distributed global rank equals Spark's single-partition
  * global window — and never plans one. */
class GlobalRankSpec extends AnyFunSuite {
  import TestSpark._

  private def customers = Tables.customer(spark, sf0001)
  private val keys = Seq(col("c_acctbal").cast("decimal(18,4)"), col("c_custkey"))

  test("two-pass global row_number equals the single-partition window") {
    import org.apache.spark.sql.expressions.Window
    val expected = customers
      .select(col("c_custkey"),
        row_number().over(Window.orderBy(keys: _*)).as("rn"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = GlobalRank.withGlobalRowNumber(customers, keys, "rn", 8)
      .select("c_custkey", "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("percentiles match percent_rank/cume_dist under a total order") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(keys: _*)
    val expected = customers
      .select(col("c_custkey"),
        percent_rank().over(w).as("p"), cume_dist().over(w).as("c"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val got = GlobalRank.withGlobalPercentiles(customers, keys, "rn", "p", "c")
      .select(col("c_custkey"), col("p"), col("c"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got.size == expected.size)
    got.foreach { case (k, (p, c)) =>
      val (ep, ec) = expected(k)
      assert(math.abs(p - ep) < 1e-12 && math.abs(c - ec) < 1e-12,
        s"custkey $k: ($p,$c) vs ($ep,$ec)")
    }
  }

  test("descending first key ranks like the single-partition desc window") {
    import org.apache.spark.sql.expressions.Window
    val dkeys = Seq(col("c_acctbal").cast("decimal(18,4)").desc, col("c_custkey"))
    val expected = customers
      .select(col("c_custkey"),
        row_number().over(Window.orderBy(dkeys: _*)).as("rn"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = GlobalRank.withGlobalRowNumber(customers, dkeys, "rn", 8)
      .select("c_custkey", "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got == expected)
  }

  test("chunk ids are value-deterministic: no partition-id or checkpoint in the plan") {
    // a row's chunk must be a pure function of its values: a plan that
    // reads spark_partition_id() after a sampled range exchange (or that
    // pins one evaluation via a checkpointed RDD) can mis-rank under task
    // retry/speculation — value-determinism is the structural guarantee
    val df = GlobalRank.withGlobalRowNumber(customers, keys, "rn", 8)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SPARK_PARTITION_ID"), "sampled-exchange pid in plan")
    assert(!p.toLowerCase.contains("existingrdd"), "checkpointed RDD in plan")
    val eval = () => df.select("c_custkey", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(eval() == eval(), "two evaluations disagree")
  }

  test("grouped row_number equals the per-group window, balanced across chunks") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf0001)
      .withColumn("h", md5(concat_ws("|", col("text"), col("doc_id"))))
    val gkeys = Seq(col("h"), col("doc_id"))
    val expected = docs.select(col("doc_id"),
        row_number().over(
          Window.partitionBy("lang").orderBy(gkeys: _*)).as("rn"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ranked = GlobalRank.withGroupedRowNumber(docs, Seq("lang"), gkeys,
      "rn", chunkKey = Some(conv(substring(col("h"), 1, 15), 16, 10)),
      numPartitions = 8)
    val got = ranked.select("doc_id", "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got.size == expected.size && got == expected)
    // the md5-prefix chunk key spreads each language over many chunks —
    // the whole point vs a single-task-per-language window: every
    // in-data window must partition on (lang, __gr_pid), not lang alone
    val winLines = ranked.queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("Window "))
    assert(winLines.exists(_.contains("__gr_pid")),
      s"no chunked window in plan:\n${winLines.mkString("\n")}")
    // determinism across evaluations
    val eval = () => ranked.select("doc_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(eval() == eval())
  }

  test("grouped rank keeps NULL-group rows, ranked as their own group") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // Window.partitionBy treats NULL as a group of its own; an equi-join
    // attach of per-group bounds/offsets would silently DROP these rows
    val df = Seq(
      (1L, "en"), (2L, "en"), (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String]), (5L, "fr"))
      .toDF("id", "lang")
    val expected = df.select(col("id"),
        row_number().over(Window.partitionBy("lang").orderBy("id")).as("rn"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = GlobalRank.withGroupedRowNumber(df, Seq("lang"),
        Seq(col("id")), "rn", numPartitions = 4)
      .select("id", "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got.size == expected.size, s"rows lost: $got vs $expected")
    assert(got == expected)
    // same for the running-sum sibling
    val expSum = df.select(col("id"),
        sum(col("id")).over(Window.partitionBy("lang").orderBy("id")
          .rowsBetween(Window.unboundedPreceding, 0)).as("run"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotSum = GlobalRank.withGroupedRunningSum(df, Seq("lang"),
        Seq(col("id")), col("id"), "run", numPartitions = 4)
      .select("id", "run")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotSum == expSum)
  }

  test("grouped running sum equals the per-group prefix-sum window") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val expected = docs.select(col("doc_id"),
        sum(col("n_chars")).over(
          Window.partitionBy("lang").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, 0)).as("run"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = GlobalRank.withGroupedRunningSum(docs, Seq("lang"),
        Seq(col("doc_id")), col("n_chars"), "run", numPartitions = 8)
      .select("doc_id", "run")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == expected.size && got == expected)
  }

  test("the distributed path plans no global single-partition window") {
    val df = GlobalRank.withGlobalRowNumber(customers, keys, "rn", 8)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // a partition-less Window shows as "Window [...], [sort...]" with no
    // partition spec; ours must always partition by the pid column —
    // assert the only Window operators mention __gr_pid or __gr_offset
    val windows = p.split("\n").filter(_.contains("Window "))
    assert(windows.nonEmpty)
    windows.filterNot(_.contains("count")) // offsets window is O(partitions)
      .foreach(w => assert(w.contains("__gr_pid"), s"unpartitioned window:\n$w"))
  }
}
