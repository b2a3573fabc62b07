package graft

import org.apache.spark.sql.SparkSession

/** Forked-JVM helper for [[CrossProcessLockSpec]]: acquires the REAL
  * freqstore writer lock (the same `withWriterLock` every mutating
  * operation uses) in a SECOND process and holds it until the test
  * JVM signals release — the deployment the lock exists for is two
  * WRITER PROCESSES racing on one store, which no in-process spec can
  * exercise.
  *
  * Protocol (files under the store dir, created by whoever gets there
  * first): the helper touches `_test_held` once it is inside the lock,
  * then spins until `_test_release` appears (or a 180 s watchdog trips
  * so a failed test cannot leak a JVM — LONGER than the spec's 120 s
  * acquire deadline plus its assertion work, so a loaded box cannot
  * have the watchdog release the lock before the spec's fail-fast
  * commit runs; round-14 ADVICE), then exits the lock scope —
  * exercising the ownership-checked release from this process. */
object LockHolder {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[1]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val store = new graft.varda.FreqStore(spark, dir, 4)
    val held = java.nio.file.Paths.get(dir, "_test_held")
    val release = java.nio.file.Paths.get(dir, "_test_release")
    store.withWriterLock("cross-process lock test") {
      java.nio.file.Files.write(held, Array.empty[Byte])
      val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
      while (!java.nio.file.Files.exists(release) &&
        System.nanoTime() < deadline) Thread.sleep(25)
    }
    spark.stop()
    sys.exit(0)
  }
}
