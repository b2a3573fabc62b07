package graft

import java.nio.file.{Files, Paths}

import graft.varda.FreqStore
import org.scalatest.funsuite.AnyFunSuite

/** The writer lock's actual deployment contract is CROSS-PROCESS: two
  * writer JVMs racing on one store directory, where the only mutual
  * exclusion is `fs.create(lockPath, overwrite = false)`. Every prior
  * lock spec ran both writers in one process; this one forks a real
  * second JVM ([[LockHolder]], which takes the lock through the same
  * `withWriterLock` production code) and pins, while it holds:
  *
  *  - a commit in this JVM fails FAST with the holder's identity in
  *    the message (no queueing, no silent takeover),
  *  - the failed attempt interleaves NO generation and does not
  *    disturb the holder's lock file,
  *  - the holder's release deletes only ITS OWN lock (ownership-safe
  *    from the other process's side), after which this JVM commits
  *    normally. */
class CrossProcessLockSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def obs1 = Seq(("1", 5000L, "A", "C", 3))
    .toDF("chromosome", "position", "reference", "observed", "support")
  private def cov1 = Seq((10L, "1", 4000L, 6000L, 1L, 2)).toDF(
    "region_id", "chromosome", "begin_pos", "end_pos", "sample_id", "pool_size")
  private def smp1 = Seq((1L, 2, true))
    .toDF("sample_id", "pool_size", "has_coverage")

  test("a second writer process fails fast and interleaves nothing") {
    val dir = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "fqs_xproc").toString
    val store = new FreqStore(spark, dir, 4)
    store.commit(0, obs1, cov1, smp1)

    // fork the holder JVM with this (forked test) JVM's exact runtime:
    // same java, same classpath, same add-opens Spark 4 needs
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val opens = Seq("java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio", "java.base/java.util",
      "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
      "java.base/sun.nio.cs", "java.base/sun.security.action",
      "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ opens ++ Seq("-Xmx2g", "-cp",
      sys.props("java.class.path"), "graft.LockHolder", dir)).toArray
    val proc = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(new java.io.File(s"$dir/_holder.log"))
      .start()
    val held = Paths.get(dir, "_test_held")
    val release = Paths.get(dir, "_test_release")
    try {
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (!Files.exists(held) && proc.isAlive &&
        System.nanoTime() < deadline) Thread.sleep(50)
      assert(Files.exists(held), "holder JVM never acquired the lock: " +
        new String(Files.readAllBytes(Paths.get(s"$dir/_holder.log"))))

      // flake guard (round-14 ADVICE): the holder's watchdog outlives
      // this spec's deadline by design, so the lock must still be held
      // here — a missing file means the watchdog fired early and the
      // intercept below would fail with a confusing "no exception"
      assert(Files.exists(Paths.get(dir, "_writer.lock")),
        "holder released the lock before the fail-fast commit ran")

      // this JVM's mutating op fails fast, naming the foreign holder
      val e = intercept[IllegalStateException] {
        store.commit(1, obs1, cov1.filter("false"), smp1.filter("false"))
      }
      assert(e.getMessage.contains("another writer holds"), e.getMessage)
      assert(e.getMessage.contains("breakLock"), e.getMessage)

      // no interleaved generation, and the holder's lock is untouched
      // by our failed acquire (the create-exclusive path never opens
      // an existing lock for write)
      assert(new FreqStore(spark, dir).generations.map(_._1) == Seq(0L))
      assert(Files.exists(Paths.get(dir, "_writer.lock")),
        "the failed acquire must not disturb the foreign lock")
    } finally {
      // ONLY the release signal lives in the finally: asserting in a
      // finally masks the primary test failure with a secondary one
      // (round-14 ADVICE) — the waitFor/exit checks run after
      Files.write(release, Array.empty[Byte])
    }
    assert(proc.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
      "holder JVM did not exit")
    assert(proc.exitValue() == 0,
      "holder exited nonzero: " +
        new String(Files.readAllBytes(Paths.get(s"$dir/_holder.log"))))
    // the holder's ownership-checked release removed ITS lock — this
    // writer can now commit normally
    assert(!Files.exists(Paths.get(dir, "_writer.lock")),
      "holder's release must delete its own lock")
    store.commit(1, obs1, cov1.filter("false"), smp1.filter("false"))
    assert(new FreqStore(spark, dir).generations.map(_._1) == Seq(0L, 1L))
  }
}
