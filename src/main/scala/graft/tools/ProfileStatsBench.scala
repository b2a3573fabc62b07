package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement (r20, verdict item 8): agg_profile_stats' defense of
  * the multi-`countDistinct` single-scan Expand(×5) plan was an
  * assertion — measure it against the alternatives at local[32]:
  *
  *  - `expand5`: the shipped form — one aggregate, 4 countDistinct +
  *    count/min/max per column (Catalyst plans Expand ×5: one replica
  *    per distinct column + one for the plain aggregates).
  *  - `two-pass`: one distinct-free aggregate (count/min/max, one scan)
  *    + four single-column distinct aggregates (each its own pruned
  *    scan) joined driver-side — 5 scans, no Expand.
  *  - `unpivot`: stack to (col_name, value) first (one scan, ×4 rows),
  *    then one plain agg + one distinct agg over the long frame.
  *
  * Usage: runMain graft.tools.ProfileStatsBench [sfDir] [reps] */
object ProfileStatsBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def e4(c: String) = expr(s"cast(floor($c * 10000) as bigint)")
    def li = graft.Tables.lineitem(spark, sfDir)

    def time(tag: String)(f: => Unit): Unit = (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"[profilestats] $tag rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("expand5") {
      val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap(c => Seq(
        count(col(c)).as(s"${c}_nn"), countDistinct(col(c)).as(s"${c}_nd"),
        min(e4(c)).as(s"${c}_min"), max(e4(c)).as(s"${c}_max")))
      li.agg(aggs.head, aggs.tail: _*).collect()
    }
    time("two-pass") {
      val plain = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap(c => Seq(
        count(col(c)).as(s"${c}_nn"),
        min(e4(c)).as(s"${c}_min"), max(e4(c)).as(s"${c}_max")))
      li.agg(plain.head, plain.tail: _*).collect()
      cols.foreach { c =>
        li.select(col(c)).agg(countDistinct(col(c)).as("nd")).collect()
      }
    }
    time("unpivot") {
      val stackArgs = cols.map(c => s"'$c', $c").mkString(", ")
      val long = li.selectExpr(
        s"stack(${cols.size}, $stackArgs) as (col_name, v)")
      long.groupBy("col_name")
        .agg(count(col("v")).as("nn"),
          min(expr("cast(floor(v * 10000) as bigint)")).as("mn"),
          max(expr("cast(floor(v * 10000) as bigint)")).as("mx"),
          countDistinct(col("v")).as("nd")).collect()
    }
    spark.stop()
  }
}
