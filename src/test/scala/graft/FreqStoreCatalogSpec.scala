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
    // the join clustering (4-part point key) is a SUPERSET of the
    // partition key (position); with the default
    // requireAllClusterKeysForCoPartition=true Spark insists every join
    // key be a partition key and falls back to a shuffle
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try body
    finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
    }
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
      // at this size Catalyst may broadcast (fine); force the at-scale
      // shape to pin the storage-partitioned path itself
      val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j2 = a.join(b, Seq("chromosome", "position"))
          .filter($"numer_a" === $"numer_b")
        assert(rowSet(j2) == rowSet(expected))
        val p = j2.queryExecution.executedPlan.toString
        assert(!p.contains("Exchange "),
          s"store-to-store join should be storage-partitioned:\n$p")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    }
  }

  test("VERSION AS OF time-travels through SQL; the drift join is shuffle-free") {
    withSpj {
      val dir = tmpDir("fqs_ver")
      val store = new FreqStore(spark, dir, 4)
      val obs0 = Seq(("1", 5000L, "A", "C", 3), ("2", 700L, "G", "T", 2))
        .toDF("chromosome", "position", "reference", "observed", "support")
      val cov = Seq((10L, "1", 4000L, 6000L, 1L, 2)).toDF(
        "region_id", "chromosome", "begin_pos", "end_pos", "sample_id", "pool_size")
      val smp = Seq((1L, 2, true), (3L, 7, false)).toDF(
        "sample_id", "pool_size", "has_coverage")
      store.commit(0, obs0, cov, smp)
      store.commit(1,
        Seq(("1", 5000L, "A", "C", 2), ("7", 91000L, "T", "G", 4)).toDF(
          "chromosome", "position", "reference", "observed", "support"),
        cov.filter("false"), smp.filter("false"))

      // SQL-standard time travel resolves through the catalog
      val v0 = spark.sql(s"SELECT * FROM fqs.`$dir` VERSION AS OF 0")
      assert(rowSet(v0) == rowSet(store.serveAsOf(0L)))
      // the drift join: head vs generation 0, SAME table both sides.
      // On this tiny fixture Catalyst rightly BROADCASTS the old side
      // (the reported statistics make that the cheap plan); disable
      // broadcast to exercise the at-scale shape — then the join must
      // be storage-partitioned with NO exchange of any kind.
      val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val drift = spark.sql(
          s"""SELECT h.chromosome, h.position, h.reference, h.observed,
                h.numer - COALESCE(o.numer, 0) AS dn
              FROM fqs.`$dir` h
              LEFT JOIN (SELECT * FROM fqs.`$dir` VERSION AS OF 0) o
                ON h.chromosome = o.chromosome AND h.position = o.position
                AND h.reference = o.reference AND h.observed = o.observed""")
        val byKey = drift.collect().map(r =>
          (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)) ->
            r.getLong(4)).toMap
        assert(byKey(("1", 5000L, "A", "C")) == 2L) // 5 head - 3 old
        assert(byKey(("7", 91000L, "T", "G")) == 4L) // new at head
        assert(byKey(("2", 700L, "G", "T")) == 0L)
        val p = drift.queryExecution.executedPlan.toString
        assert(!p.contains("Exchange "),
          s"the drift join should be fully storage-partitioned:\n$p")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
      // a pre-snapshot version fails at plan time after compaction
      store.compact()
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM fqs.`$dir` VERSION AS OF 0").collect()
      }
      assert(e.getMessage.contains("snapshot"), e.getMessage)
    }
  }

  test("TIMESTAMP AS OF resolves wall-clock to the matching generation") {
    withSpj {
      val dir = tmpDir("fqs_ts")
      val store = new FreqStore(spark, dir, 4)
      val obs0 = Seq(("1", 5000L, "A", "C", 3), ("2", 700L, "G", "T", 2))
        .toDF("chromosome", "position", "reference", "observed", "support")
      val cov = Seq((10L, "1", 4000L, 6000L, 1L, 2)).toDF(
        "region_id", "chromosome", "begin_pos", "end_pos", "sample_id", "pool_size")
      val smp = Seq((1L, 2, true)).toDF("sample_id", "pool_size", "has_coverage")
      val tBefore = System.currentTimeMillis() - 5
      store.commit(0, obs0, cov, smp)
      Thread.sleep(30) // marker mtimes must order the generations
      val tBetween = System.currentTimeMillis()
      Thread.sleep(30)
      store.commit(1,
        Seq(("1", 5000L, "A", "C", 2)).toDF(
          "chromosome", "position", "reference", "observed", "support"),
        cov.filter("false"), smp.filter("false"))
      def sqlTs(ms: Long): String = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(ms))
      // between the commits → generation 0's frame, row-equal to the
      // matching VERSION AS OF
      val byTs = spark.sql(
        s"SELECT * FROM fqs.`$dir` TIMESTAMP AS OF '${sqlTs(tBetween)}'")
      assert(rowSet(byTs) == rowSet(store.serveAsOf(0L)))
      assert(rowSet(byTs) ==
        rowSet(spark.sql(s"SELECT * FROM fqs.`$dir` VERSION AS OF 0")))
      // now (after both) → the head
      val byNow = spark.sql(s"SELECT * FROM fqs.`$dir` TIMESTAMP AS OF " +
        s"'${sqlTs(System.currentTimeMillis() + 60000)}'")
      assert(rowSet(byNow) == rowSet(store.serve()))
      // before the first commit → loud plan-time failure
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM fqs.`$dir` TIMESTAMP AS OF " +
          s"'${sqlTs(tBefore)}'").collect()
      }
      assert(e.getMessage.contains("predates"), e.getMessage)
      // a timestamp landing below the snapshot floor fails like the
      // matching VERSION AS OF does
      store.commit(2,
        Seq(("3", 42L, "A", "T", 1)).toDF(
          "chromosome", "position", "reference", "observed", "support"),
        cov.filter("false"), smp.filter("false"))
      store.compact()
      val e2 = intercept[Exception] {
        spark.sql(s"SELECT * FROM fqs.`$dir` TIMESTAMP AS OF " +
          s"'${sqlTs(tBetween)}'").collect()
      }
      assert(e2.getMessage.contains("snapshot"), e2.getMessage)
    }
  }

  test("TIMESTAMP AS OF survives a marker copy/restore (bless is content, not mtime)") {
    withSpj {
      // a copied/restored/rsynced store rewrites every file mtime; the
      // commit wall-clock must live in the marker CONTENT so the
      // store's time-travel history survives the move (round-14)
      val dir = tmpDir("fqs_clk")
      val store = new FreqStore(spark, dir, 4)
      val cov = Seq((10L, "1", 4000L, 6000L, 1L, 2)).toDF(
        "region_id", "chromosome", "begin_pos", "end_pos", "sample_id", "pool_size")
      val smp = Seq((1L, 2, true)).toDF("sample_id", "pool_size", "has_coverage")
      store.commit(0, Seq(("1", 5000L, "A", "C", 3)).toDF(
        "chromosome", "position", "reference", "observed", "support"), cov, smp)
      Thread.sleep(5)
      val tBetween = System.currentTimeMillis()
      Thread.sleep(5)
      store.commit(1, Seq(("1", 5000L, "A", "C", 2)).toDF(
        "chromosome", "position", "reference", "observed", "support"),
        cov.filter("false"), smp.filter("false"))
      def sqlTs(ms: Long): String = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(ms))
      val expected = rowSet(store.serveAsOf(0L))
      // simulate the restore: rewrite each marker byte-identical (mtime
      // becomes NOW) and then scramble mtimes into REVERSED id order
      val commits = Paths.get(dir, "_commits")
      val markers = Files.list(commits).toArray.map(_.toString)
        .filter(m => Paths.get(m).getFileName.toString.startsWith("gen-"))
        .sorted
      def dropCrc(p: java.nio.file.Path): Unit =
        Files.deleteIfExists(p.getParent.resolve(s".${p.getFileName}.crc"))
      markers.zipWithIndex.foreach { case (m, i) =>
        val p = Paths.get(m)
        val bytes = Files.readAllBytes(p)
        Files.delete(p); dropCrc(p); Files.write(p, bytes)
        Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime
          .fromMillis(System.currentTimeMillis() + (markers.length - i) * 60000L))
      }
      // a fresh resolution (new store instance per SQL plan) still maps
      // the between-commits wall-clock to generation 0
      val byTs = spark.sql(
        s"SELECT * FROM fqs.`$dir` TIMESTAMP AS OF '${sqlTs(tBetween)}'")
      assert(rowSet(byTs) == expected)
      // legacy markers (no 4th token, pre-round-14) fall back to mtime:
      // strip the bless token and resolution degrades to mtime order
      markers.foreach { m =>
        val p = Paths.get(m)
        val parts = new String(Files.readAllBytes(p), "UTF-8").trim.split("\\s+")
        Files.delete(p); dropCrc(p)
        Files.write(p, parts.take(3).mkString(" ").getBytes("UTF-8"))
        Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime
          .fromMillis(tBetween - 1000L))
      }
      val legacy = new FreqStore(spark, dir, 4)
      assert(legacy.generationAt(tBetween) == 1L,
        "legacy 3-token markers must resolve through mtimes")
    }
  }

  test("a broadcast probe join against a catalog table runtime-prunes and stays correct") {
    withSpj {
      // the common serving join (annotation frame ⟕ store) must keep
      // working when the scan ALSO reports key-grouped partitioning:
      // Catalyst broadcasts the probe side, runtime filtering re-prunes
      // the store's partitions, and the reported partitioning must not
      // confuse the post-filter re-grouping
      import org.apache.spark.sql.functions.when
      val (store, dir) = builtStore()
      graft.sources.FreqStoreDataSource.lastRuntimeBuckets = None
      val t = spark.table(s"fqs.`$dir`")
      // dynamic pruning needs a range-derived probe with a SURVIVING
      // selective predicate and a pinned broadcast build side (the
      // FreqStoreDsv2Spec runtime test's documented shape)
      val probe = spark.range(0, 3).select(
          when($"id" === 2, "9").otherwise("1").as("chromosome"),
          when($"id" === 0, 5000L).when($"id" === 1, 91000L).otherwise(123L)
            .as("position"),
          when($"id" === 2, "decoy").otherwise("probe").as("tag"))
        .filter($"tag" === "probe")
      val j = org.apache.spark.sql.functions.broadcast(probe)
        .join(t, Seq("chromosome", "position"))
        .select($"chromosome", $"position", $"numer")
      val expected = store.serve()
        .filter("chromosome = '1' AND position IN (5000, 91000)")
        .select($"chromosome", $"position", $"numer")
      assert(rowSet(j) == rowSet(expected))
      // runtime filtering fired and pruned to the probes' buckets
      val rb = graft.sources.FreqStoreDataSource.lastRuntimeBuckets
      assert(rb.exists(_.size <= 2), s"runtime pruning did not fire: $rb")
    }
  }

  test("the catalog is read-only and the bucket function is the store's") {
    withSpj {
      val (_, dir) = builtStore()
      intercept[UnsupportedOperationException] {
        spark.sql(s"DROP TABLE fqs.`$dir`")
      }
      // a typo'd store path is a MISSING TABLE, not an empty cohort
      val missing = intercept[Exception] {
        spark.table(s"fqs.`/no/such/store-${System.nanoTime()}`").collect()
      }
      assert(missing.getMessage.toLowerCase.contains("table"),
        missing.getMessage)
      // the declared transform's function computes the store's own hash
      val f = new graft.sources.PointBucketBound(8)
      val rows = Seq(5000L, 123L, 90001L, (1L << 33) + 7)
      rows.foreach { p =>
        val ir = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](p))
        assert(f.produceResult(ir) == FreqStore.pointBucket(p, 8))
      }
      // NULL position → NULL bucket, not cell-0's bucket (round-12 ADVICE)
      val nullRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](null))
      assert(f.produceResult(nullRow) == null,
        "point_bucket(NULL) must be NULL")
      assert(f.isResultNullable)
    }
  }

  test("a namespaced table identifier fails instead of resolving by its last part") {
    withSpj {
      val (_, dir) = builtStore()
      // round-12 ADVICE: `fqs.ns.store` used to silently read `store`;
      // the namespace guard must reject it in BOTH loadTable overloads
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM fqs.typo_ns.`$dir`").collect()
      }
      assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
      val ev = intercept[Exception] {
        spark.sql(s"SELECT * FROM fqs.typo_ns.`$dir` VERSION AS OF 0").collect()
      }
      assert(ev.getMessage.toLowerCase.contains("table"), ev.getMessage)
      // the un-namespaced name still resolves
      assert(spark.table(s"fqs.`$dir`").count() > 0)
    }
  }

  // ---- SQL DELETE on the observation-log component view (round 16)

  /** Twin stores with sample-TAGGED observations across two commits —
    * the shape where a retraction touches numerators, coverage,
    * denominators and the registry at once. */
  private def taggedStore(): String = {
    val dir = tmpDir("fqs_del")
    val store = new FreqStore(spark, dir, nBuckets = 4)
    val obs0 = Seq(
      ("1", 5000L, "A", "C", 3, 1L), ("1", 5000L, "A", "C", 2, 2L),
      ("2", 700L, "G", "T", 4, 2L)).toDF(
      "chromosome", "position", "reference", "observed", "support",
      "sample_id")
    val cov0 = Seq(
      (10L, "1", 4000L, 6000L, 1L, 2), (14L, "2", 600L, 800L, 2L, 5))
      .toDF("region_id", "chromosome", "begin_pos", "end_pos",
        "sample_id", "pool_size")
    val smp0 = Seq((1L, 2, true), (2L, 5, true)).toDF(
      "sample_id", "pool_size", "has_coverage")
    store.commit(0, obs0, cov0, smp0)
    store.commit(1,
      Seq(("X", 9000L, "T", "A", 1, 2L)).toDF("chromosome", "position",
        "reference", "observed", "support", "sample_id"),
      cov0.filter("false"),
      Seq((3L, 7, false)).toDF("sample_id", "pool_size", "has_coverage"))
    dir
  }

  test("SQL DELETE on the #obslog view is row-identical to CALL " +
      "retract_samples on a twin store — lock and generation contract " +
      "intact") {
    withSpj {
      val dirA = taggedStore()
      val dirB = taggedStore()
      // the DML form: DELETE allocates the next generation (2) under
      // the writer lock, exactly as INSERT INTO allocates for commits
      spark.sql(s"DELETE FROM fqs.`$dirA#obslog` WHERE sample_id IN (2)")
      // the procedural form on the twin, pinned to the same generation
      spark.sql(s"CALL fqs.retract_samples('$dirB', 2, array(2L))")
      val a = new FreqStore(spark, dirA)
      val b = new FreqStore(spark, dirB)
      assert(rowSet(a.serve()) == rowSet(b.serve()))
      assert(a.generations == b.generations)
      assert(a.generations.map(_._1).max == 2L,
        "DELETE must land as the next generation from the commit log")
      // the log view shows the retraction as tombstones (negative
      // support), netting sample 2 to zero — and the twin's log agrees
      assert(rowSet(spark.table(s"fqs.`$dirA#obslog`")) ==
        rowSet(spark.table(s"fqs.`$dirB#obslog`")))
      val net = spark.table(s"fqs.`$dirA#obslog`")
        .groupBy("sample_id")
        .agg(org.apache.spark.sql.functions.sum("support").as("net"))
        .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) ->
          r.getLong(1)).toMap
      assert(net(2L) == 0L, s"sample 2 must net to zero, got $net")
      assert(net(1L) == 3L, s"sample 1 must survive, got $net")
      // no lock left behind: a later mutation acquires cleanly
      spark.sql(s"CALL fqs.compact('$dirA')")
    }
  }

  test("DELETE is idempotent AND vacuous DELETEs are true no-ops: no " +
      "generation committed for nothing-to-retract") {
    withSpj {
      val dir = taggedStore()
      spark.sql(s"DELETE FROM fqs.`$dir#obslog` WHERE sample_id = 2")
      val st = new FreqStore(spark, dir)
      val once = rowSet(st.serve())
      val gensOnce = st.generations
      // repeated DELETE of an already-retracted sample: state unchanged
      // AND the commit log does not grow (round-16 review — a vacuous
      // retraction generation would emit an empty change-feed batch and
      // lengthen every replay for no state change)
      spark.sql(s"DELETE FROM fqs.`$dir#obslog` WHERE sample_id = 2")
      assert(rowSet(new FreqStore(spark, dir).serve()) == once)
      assert(new FreqStore(spark, dir).generations == gensOnce,
        "a repeated DELETE must not commit a generation")
      // DELETE of a sample that never existed: same no-op contract
      spark.sql(s"DELETE FROM fqs.`$dir#obslog` WHERE sample_id IN (999)")
      assert(new FreqStore(spark, dir).generations == gensOnce,
        "a mistargeted DELETE must not commit a generation")
      // and a REAL retraction afterwards still lands cleanly
      spark.sql(s"DELETE FROM fqs.`$dir#obslog` WHERE sample_id = 1")
      assert(new FreqStore(spark, dir).generations.size == gensOnce.size + 1)
    }
  }

  test("DELETE refuses predicates the retraction algebra cannot honor " +
      "— and bare DELETE (truncate)") {
    withSpj {
      val dir = taggedStore()
      val before = rowSet(spark.table(s"fqs.`$dir#obslog`"))
      val e1 = intercept[Exception] {
        spark.sql(s"DELETE FROM fqs.`$dir#obslog` WHERE position = 5000")
      }
      assert(e1.getMessage.toLowerCase.contains("delete"), e1.getMessage)
      val e2 = intercept[Exception] {
        spark.sql(s"DELETE FROM fqs.`$dir#obslog`")
      }
      assert(e2.getMessage.toLowerCase.contains("delete") ||
        e2.getMessage.toLowerCase.contains("truncate"), e2.getMessage)
      // refused statements mutated nothing
      assert(rowSet(spark.table(s"fqs.`$dir#obslog`")) == before)
    }
  }

  test("the #obslog view reads the observation LOG (generation-tagged; " +
      "snapshots net it) and refuses time travel") {
    withSpj {
      val dir = taggedStore()
      val t = spark.table(s"fqs.`$dir#obslog`")
      assert(t.columns.toSeq == Seq("generation", "chromosome", "position",
        "reference", "observed", "sample_id", "support"))
      assert(t.select("generation").distinct().collect()
        .map(_.getLong(0)).toSet == Set(0L, 1L))
      assert(t.count() == 4L)
      val ev = intercept[Exception] {
        spark.sql(s"SELECT * FROM fqs.`$dir#obslog` VERSION AS OF 0").collect()
      }
      assert(ev.getMessage.contains("component"), ev.getMessage)
      // DELETE + compact: tombstones fold away, rows carry the snapshot
      // head's generation id
      spark.sql(s"DELETE FROM fqs.`$dir#obslog` WHERE sample_id IN (2)")
      spark.sql(s"CALL fqs.compact('$dir')")
      val snap = spark.table(s"fqs.`$dir#obslog`").collect()
      assert(snap.forall(_.getLong(6) > 0), "netted log has no tombstones")
      assert(snap.map(r => (r.getString(1), r.getLong(2))).toSet ==
        Set(("1", 5000L)), "only sample 1's observation survives")
      // an unknown component view fails with the available list
      val eu = intercept[Exception] {
        spark.table(s"fqs.`$dir#covlog`").collect()
      }
      assert(eu.getMessage.contains("obslog"), eu.getMessage)
    }
  }
}
