package graft

import java.nio.file.{Files, Paths}

import graft.streaming.Ingest
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end file-stream ingestion: line files land in a watched dir, the
  * streaming query parses and appends them to partitioned parquet, and a
  * restart picks up only new files (checkpointed exactly-once). */
class IngestSpec extends AnyFunSuite {
  import TestSpark._

  test("observation line files stream into chromosome-partitioned parquet") {
    val base = Files.createTempDirectory(Paths.get("/root/repo/target"), "ingest")
    val (src, dest, ckpt) = (s"$base/src", s"$base/dest", s"$base/ckpt")
    Files.createDirectories(Paths.get(src))

    def lines(path: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(path), String.join("\n", rows: _*).getBytes)

    lines(s"$src/batch1.txt", Seq(
      "1;1;1000;A;T;1", "2;1;2000;C;G;2", "3;2;1500;G;A;1"))
    val q1 = Ingest.startObservationIngest(spark, src, dest, ckpt)
    q1.awaitTermination()

    val after1 = Ingest.readIngested(spark, dest)
    assert(after1.count() == 3)
    assert(after1.schema.fieldNames.contains("chromosome"))
    // partition pruning works on the layout
    assert(after1.filter(after1("chromosome") === "1").count() == 2)

    // new file arrives; restart processes ONLY the new one (checkpoint)
    lines(s"$src/batch2.txt", Seq("4;2;1700;T;C;2"))
    val q2 = Ingest.startObservationIngest(spark, src, dest, ckpt)
    q2.awaitTermination()

    val after2 = Ingest.readIngested(spark, dest)
    assert(after2.count() == 4)
    val row4 = after2.filter(after2("obs_id") === 4).collect()
    assert(row4.length == 1 && row4(0).getAs[String]("chromosome") == "2"
      && row4(0).getAs[Long]("position") == 1700L)
  }
}
