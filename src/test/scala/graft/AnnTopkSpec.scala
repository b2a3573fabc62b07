package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded top-k aggregate ([[graft.functions.TopKByScore]]) that
  * replaced the ANN rank windows (round 17) must be ROW-IDENTICAL to the
  * `row_number` window it replaced — same (score DESC, id ASC)
  * discipline — on adversarial shapes: score ties, groups smaller than
  * k, duplicate scores across partitions (exercising the map-side
  * partial MERGE path), and MinValue floor entries (the NaN-cosine
  * stand-in). */
class AnnTopkSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("qid")
      .agg(graft.functions.TopKByScore.topk(k, col("score"), col("nid"))
        .as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("i", "sc")))
      .select(col("qid"), (col("i") + 1).cast("int").as("rank"),
        col("sc.id").as("nid"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("nid"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("qid", "rank", "nid")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
  }

  test("top-k aggregate == row_number window on near-tie fixtures, " +
      "across ks and the partial-merge path") {
    // deterministic adversarial frame: heavy score ties (mod 5), group
    // sizes 1..13 (some below k), a MinValue floor row per group, and
    // 16 input partitions so map-side partials MUST merge
    val rows = for {
      g <- 0L until 40L
      i <- 0L to (g % 13)
    } yield (g, if (i == g % 13) Long.MinValue else (i * 37) % 5, i)
    val df = spark.createDataset(rows).toDF("qid", "score", "nid")
      .repartition(16)
    for (k <- Seq(1, 3, 5, 20)) {
      assert(viaAgg(df, k) == viaWindow(df, k),
        s"aggregate diverged from the window at k=$k")
    }
  }

  test("randomized parity: seeded duplicate-heavy scores") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(2000)(
      (rnd.nextInt(25).toLong, rnd.nextInt(8).toLong, rnd.nextInt(400).toLong))
      .distinct // (qid, nid) unique like real candidate pairs
      .map { case (q, s, n) => (q, s, n) }
    val df = spark.createDataset(rows).toDF("qid", "score", "nid")
      .repartition(32)
    assert(viaAgg(df, 5) == viaWindow(df, 5))
  }
}
