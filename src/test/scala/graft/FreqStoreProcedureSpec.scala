package graft

import java.nio.file.{Files, Paths}

import graft.varda.FreqStore
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The store's MUTATING lifecycle through Spark 4 stored procedures
  * (`CALL fqs.import_batch/retract_samples/compact/break_lock`) — the
  * reference runs imports, sample deactivation and maintenance as task
  * endpoints [U varda/tasks.py], and this surface makes each one a
  * single SQL statement. Every CALL is pinned row-identical to the
  * same lifecycle driven through the FreqStore API on a twin store. */
class FreqStoreProcedureSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(Paths.get("/root/repo/target"), prefix).toString

  private def withCat[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.fqs",
      classOf[graft.sources.FreqStoreCatalog].getName)
    // unset after the body: the shared TestSpark session must not carry
    // this suite's catalog registration into later suites (cross-suite
    // state would make results ordering-dependent)
    try body
    finally spark.conf.unset("spark.sql.catalog.fqs")
  }

  private def rowSet(df: DataFrame) = df.collect()
    .map(_.toSeq.map(v => if (v == null) "∅" else v.toString)).toSet

  private def batch1 = (
    Seq(("1", 5000L, "A", "C", 3, Some(1L)), ("1", 5000L, "A", "G", 1, Some(2L)),
      ("X", 5000L, "A", "C", 1, Some(2L)), ("2", 700L, "G", "T", 2, Some(2L)),
      ("7", 91000L, "T", "G", 4, Some(1L)))
      .toDF("chromosome", "position", "reference", "observed", "support",
        "sample_id"),
    Seq(("1", 4000L, 6000L, 1L, 2), ("2", 600L, 800L, 2L, 5),
      ("X", 4500L, 5500L, 2L, 5), ("7", 90000L, 95000L, 1L, 2))
      .toDF("chromosome", "begin_pos", "end_pos", "sample_id", "pool_size"),
    Seq((1L, 2, true), (2L, 5, true), (3L, 7, false))
      .toDF("sample_id", "pool_size", "has_coverage"))

  private def batch2 = (
    Seq(("1", 5000L, "A", "C", 2, Some(4L)), ("2", 700L, "G", "T", 1, Some(4L)))
      .toDF("chromosome", "position", "reference", "observed", "support",
        "sample_id"),
    Seq(("1", 4800L, 5200L, 4L, 3), ("2", 650L, 750L, 4L, 3))
      .toDF("chromosome", "begin_pos", "end_pos", "sample_id", "pool_size"),
    Seq((4L, 3, true)).toDF("sample_id", "pool_size", "has_coverage"))

  test("the import/retract/compact lifecycle runs as CALL statements") {
    withCat {
      val dir = tmpDir("fqs_proc")
      val twin = tmpDir("fqs_proc_twin")

      // batch 1 through CALL (defaulted n_buckets = 16 sizes the NEW
      // store); the twin through the API
      val (o1, c1, s1) = batch1
      o1.createOrReplaceTempView("proc_obs1")
      c1.createOrReplaceTempView("proc_cov1")
      s1.createOrReplaceTempView("proc_smp1")
      val r1 = spark.sql(
        s"CALL fqs.import_batch('$dir', 0, 'proc_obs1', 'proc_cov1', 'proc_smp1')")
        .collect()
      assert(r1.map(_.toSeq).toSeq == Seq(Seq(dir, 0L)))
      new FreqStore(spark, twin).commit(0, o1, c1, s1)

      val served = spark.table(s"fqs.`$dir`")
      assert(rowSet(served) == rowSet(new FreqStore(spark, twin).serve()))
      assert(served.count() > 0)

      // batch 2, named-argument form (argument names are the contract).
      // n_buckets here is IGNORED: the store's committed modulus is
      // authoritative, so a mismatched hint must not fork the layout
      val (o2, c2, s2) = batch2
      o2.createOrReplaceTempView("proc_obs2")
      c2.createOrReplaceTempView("proc_cov2")
      s2.createOrReplaceTempView("proc_smp2")
      spark.sql(
        s"""CALL fqs.import_batch(store => '$dir', batch_id => 1,
              observations => 'proc_obs2', coverage => 'proc_cov2',
              samples => 'proc_smp2', n_buckets => 4)""").collect()
      new FreqStore(spark, twin).commit(1, o2, c2, s2)
      assert(rowSet(spark.table(s"fqs.`$dir`")) ==
        rowSet(new FreqStore(spark, twin).serve()))

      // deactivate sample 2 by id alone — the procedure derives the
      // observations from the obslog, exactly like the API path
      val r3 = spark.sql(
        s"CALL fqs.retract_samples('$dir', 2, array(2L))").collect()
      assert(r3.map(_.toSeq).toSeq == Seq(Seq(dir, 2L, 1)))
      new FreqStore(spark, twin)
        .retractSamples(2, Seq(2L).toDF("sample_id"))
      assert(rowSet(spark.table(s"fqs.`$dir`")) ==
        rowSet(new FreqStore(spark, twin).serve()))

      // time-travel discovery: the three generations (2 imports + the
      // retraction) are all addressable pre-compact
      val gens = spark.sql(s"CALL fqs.show_generations('$dir')").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3)))
      assert(gens.map(_._1).toSeq == Seq(0L, 1L, 2L), gens.mkString(","))
      assert(gens.forall(_._3), "all pre-compact generations are live")

      // compact with defaulted retain_gens/split_threshold: the head
      // serves identically from one snapshot
      val before = rowSet(spark.table(s"fqs.`$dir`"))
      val r4 = spark.sql(s"CALL fqs.compact('$dir')").collect()
      assert(r4.head.getString(0) == dir && r4.head.getInt(1) > 0)
      assert(rowSet(spark.table(s"fqs.`$dir`")) == before)

      // post-compact: one snapshot generation (version > 0) is the
      // whole address space
      val gens2 = spark.sql(s"CALL fqs.show_generations('$dir')").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3)))
      assert(gens2.count(_._3) == 1 && gens2.filter(_._3).head._2 > 0,
        gens2.mkString(","))

      // break_lock is a no-op on an unlocked store and reports the dir
      assert(spark.sql(s"CALL fqs.break_lock('$dir')")
        .collect().head.getString(0) == dir)
    }
  }

  test("INSERT INTO the catalog table commits one generation, twin to the API") {
    withCat {
      val dir = tmpDir("fqs_ins")
      val twin = tmpDir("fqs_ins_twin")
      val (obs1, cov1, smp1) = batch1
      // generation 0 with coverage through the API on BOTH stores
      new FreqStore(spark, dir, 4).commit(0, obs1, cov1, smp1)
      val twinStore = new FreqStore(spark, twin, 4)
      twinStore.commit(0, obs1, cov1, smp1)

      // the INSERT: observation rows via a column-list SELECT — Spark
      // fills denom/freq_ppm with NULL; numer carries the support count
      obs1.sparkSession.sql(
        s"""INSERT INTO fqs.`$dir` (chromosome, position, reference,
              observed, numer)
            SELECT '1', 5000L, 'A', 'C', 2 UNION ALL
            SELECT '2', 700L, 'G', 'T', 1""")
      // twin: the same rows through the API commit path
      twinStore.commit(1,
        Seq(("1", 5000L, "A", "C", 2), ("2", 700L, "G", "T", 1))
          .toDF("chromosome", "position", "reference", "observed", "support"),
        cov1.filter("false"), smp1.filter("false"))
      assert(rowSet(new FreqStore(spark, dir).serve()) ==
        rowSet(twinStore.serve()),
        "INSERT-driven store diverged from the API-driven twin")
      // the INSERT became ONE addressable generation (VERSION AS OF 1)
      assert(rowSet(spark.sql(s"SELECT * FROM fqs.`$dir` VERSION AS OF 1")) ==
        rowSet(twinStore.serve()))
      assert(rowSet(spark.sql(s"SELECT * FROM fqs.`$dir` VERSION AS OF 0")) ==
        rowSet(twinStore.serveAsOf(0L)))

      // misuse fails loudly: explicit derived-column values…
      val eDerived = intercept[Exception] {
        spark.sql(s"""INSERT INTO fqs.`$dir`
          SELECT '1', 6000L, 'A', 'T', 1L, 100L, 5L""")
      }
      assert(eDerived.getMessage.contains("DERIVED"), eDerived.getMessage)
      // …a NULL support count…
      val eNull = intercept[Exception] {
        spark.sql(s"""INSERT INTO fqs.`$dir` (chromosome, position,
            reference, observed)
          SELECT '1', 6000L, 'A', 'T'""")
      }
      assert(eNull.getMessage.contains("numer"), eNull.getMessage)
      // …and INSERT OVERWRITE
      val eOver = intercept[Exception] {
        spark.sql(s"""INSERT OVERWRITE fqs.`$dir` (chromosome, position,
            reference, observed, numer)
          SELECT '1', 6000L, 'A', 'T', 1L""")
      }
      assert(eOver.getMessage.toLowerCase.contains("overwrite") ||
        eOver.getMessage.toLowerCase.contains("truncate"), eOver.getMessage)
      // the failed attempts committed nothing
      assert(rowSet(new FreqStore(spark, dir).serve()) ==
        rowSet(twinStore.serve()))
      // a zero-row SELECT is a no-op: no generation id consumed, no
      // marker written, nothing for future folds to replay (round-14)
      val gensBefore = new FreqStore(spark, dir).generations.map(_._1)
      spark.sql(s"""INSERT INTO fqs.`$dir` (chromosome, position,
          reference, observed, numer)
        SELECT '1', 1L, 'A', 'T', 1L WHERE 1 = 0""")
      assert(new FreqStore(spark, dir).generations.map(_._1) == gensBefore,
        "an empty INSERT must not commit a generation")
    }
  }

  test("procedure misuse fails loudly") {
    withCat {
      val dir = tmpDir("fqs_proc_err")
      // unknown procedure names the available ones
      val eNo = intercept[Exception] {
        spark.sql(s"CALL fqs.no_such_proc('$dir')").collect()
      }
      // Spark wraps loadProcedure's error in FAILED_TO_LOAD_ROUTINE; the
      // catalog's available-procedures hint rides the cause chain
      val msgs = Iterator.iterate(eNo: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString("\n")
      assert(msgs.contains("no_such_proc") &&
        (msgs.contains("import_batch") || msgs.contains("FAILED_TO_LOAD")),
        msgs)
      // an empty retraction set is a caller bug, not a silent no-op
      val eEmpty = intercept[Exception] {
        spark.sql(s"CALL fqs.retract_samples('$dir', 9, array())").collect()
      }
      assert(eEmpty.getMessage.toLowerCase.contains("non-empty")
        || eEmpty.getMessage.toLowerCase.contains("empty"), eEmpty.getMessage)
      // a namespaced identifier is a typo, not a resolvable procedure —
      // a MUTATING call must not run under a nonexistent namespace
      val eNs = intercept[Exception] {
        spark.sql(s"CALL fqs.typo_ns.break_lock('$dir')").collect()
      }
      assert(eNs.getMessage.contains("namespace") ||
        eNs.getMessage.contains("FAILED_TO_LOAD"), eNs.getMessage)
      // argument guards fire at the CALL boundary, before store work
      val eNb = intercept[Exception] {
        spark.sql(
          s"""CALL fqs.import_batch('$dir/x', 0, 'a', 'b', 'c',
                n_buckets => 0)""").collect()
      }
      assert(eNb.getMessage.contains("n_buckets"), eNb.getMessage)
      val eNull = intercept[Exception] {
        spark.sql("CALL fqs.break_lock(NULL)").collect()
      }
      assert(eNull.getMessage.contains("NULL") ||
        eNull.getMessage.toLowerCase.contains("null"), eNull.getMessage)
      // SHOW PROCEDURES enumerates the surface
      val names = spark.sql("SHOW PROCEDURES IN fqs").collect()
        .map(_.toSeq.map(String.valueOf).mkString(" ")).mkString("\n")
      assert(Seq("import_batch", "retract_samples", "compact", "break_lock")
        .forall(names.contains), names)
      // DESCRIBE surfaces the contract (description + parameters)
      val desc = spark.sql("DESCRIBE PROCEDURE fqs.import_batch").collect()
        .map(_.toSeq.map(String.valueOf).mkString(" ")).mkString("\n")
      assert(desc.contains("import_batch"), desc)
    }
  }
}
