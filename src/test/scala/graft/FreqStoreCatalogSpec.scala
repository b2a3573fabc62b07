package graft

import java.nio.file.{Files, Paths}

import graft.varda.FreqStore
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned planning over catalog-loaded freqstore tables:
  * the table declares `point_bucket_<n>(position)` (single-argument —
  * the reason round 12 took the chromosome out of the bucket hash) and
  * each scan partition reports its bucket id, so Catalyst must
  * aggregate on the point key with ZERO exchange and join two
  * same-modulus stores without shuffling either side. */
class FreqStoreCatalogSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(Paths.get("/root/repo/target"), prefix).toString

  private def builtStore(nBuckets: Int = 4): (FreqStore, String) = {
    val dir = tmpDir("fqs_cat")
    val store = new FreqStore(spark, dir, nBuckets)
    val obs = Seq(
      ("1", 5000L, "A", "C", 3), ("1", 5000L, "A", "G", 1),
      ("X", 5000L, "A", "C", 1), ("2", 700L, "G", "T", 2),
      ("7", 91000L, "T", "G", 4))
      .toDF("chromosome", "position", "reference", "observed", "support")
    val cov = Seq(
      (10L, "1", 4000L, 6000L, 1L, 2), (14L, "2", 600L, 800L, 2L, 5),
      (15L, "7", 90000L, 95000L, 1L, 2))
      .toDF("region_id", "chromosome", "begin_pos", "end_pos",
        "sample_id", "pool_size")
    val smp = Seq((1L, 2, true), (2L, 5, true), (3L, 7, false))
      .toDF("sample_id", "pool_size", "has_coverage")
    store.commit(0, obs, cov, smp)
    (store, dir)
  }

  private def withSpj[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.fqs", classOf[graft.sources.FreqStoreCatalog].getName)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try body
    finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
  }

  private def shuffles(df: DataFrame): Int = {
    val p = df.queryExecution.executedPlan.toString
    p.split("Exchange ").length - 1
  }

  private def rowSet(df: DataFrame) = df.collect()
    .map(_.toSeq.map(v => if (v == null) "∅" else v.toString)).toSet

  test("GROUP BY the point key aggregates with zero exchange") {
    withSpj {
      val (store, dir) = builtStore()
      val t = spark.table(s"fqs.`$dir`")
      val agg = t.groupBy("chromosome", "position")
        .agg(org.apache.spark.sql.functions.sum("numer").as("n"))
      // parity first: the partitioning claim must never bend rows
      val viaServe = store.serve().groupBy("chromosome", "position")
        .agg(org.apache.spark.sql.functions.sum("numer").as("n"))
      assert(rowSet(agg) == rowSet(viaServe))
      assert(shuffles(agg) == 0,
        s"point-key aggregation should be exchange-free:\n${agg.queryExecution.executedPlan}")
    }
  }

  test("a store-to-store point-key join is storage-partitioned (no shuffle)") {
    withSpj {
      val (storeA, dirA) = builtStore()
      val (storeB, dirB) = builtStore()
      val a = spark.table(s"fqs.`$dirA`").select($"chromosome", $"position",
        $"reference", $"observed", $"numer".as("numer_a"))
      val b = spark.table(s"fqs.`$dirB`").select($"chromosome", $"position",
        $"reference", $"observed", $"numer".as("numer_b"))
      // the cohort-comparison shape: same variant universe, two stores
      val j = a.join(b, Seq("chromosome", "position"))
        .filter($"numer_a" === $"numer_b")
      val expected = storeA.serve().select($"chromosome", $"position",
          $"reference", $"observed", $"numer".as("numer_a"))
        .join(storeB.serve().select($"chromosome", $"position",
          $"reference", $"observed", $"numer".as("numer_b")),
          Seq("chromosome", "position"))
        .filter($"numer_a" === $"numer_b")
      assert(rowSet(j) == rowSet(expected))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"store-to-store join should be storage-partitioned:\n$p")
    }
  }

  test("the catalog is read-only and the bucket function is the store's") {
    withSpj {
      val (_, dir) = builtStore()
      intercept[UnsupportedOperationException] {
        spark.sql(s"DROP TABLE fqs.`$dir`")
      }
      // the declared transform's function computes the store's own hash
      val f = new graft.sources.PointBucketBound(8)
      val rows = Seq(5000L, 123L, 90001L, (1L << 33) + 7)
      rows.foreach { p =>
        val ir = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](p))
        assert(f.produceResult(ir) == FreqStore.pointBucket(p, 8))
      }
    }
  }
}
