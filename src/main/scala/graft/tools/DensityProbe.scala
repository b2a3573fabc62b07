package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Density-controlled decade probe (round 16, closing VERDICT r15
  * "What's missing #4"): the sweep-family keys' measured sf1→sf10
  * ratios (~5×) ride the FIXTURE's mod-100k coordinate wrap — 10× rows
  * in a FIXED coordinate space is an adversarially DENSE decade (each
  * point's covering multiplicity itself grows 10×), which SURVEY §6
  * could only argue, not measure, because the fixture formulas are
  * normative (they run in the DuckDB oracle too) and their position
  * space is structurally capped at 22 × 100k.
  *
  * This probe measures the claim directly: it drives the SAME operator
  * code the declared keys run — [[graft.varda.VardaOps.coverageAggBySweep]]
  * (varda_coverage_join's plan), [[graft.varda.VardaOps.denovoFrom]]
  * (varda_trio_denovo's), and the foldFreqState → retractSample →
  * serveFreqState chain (varda_sample_retract's) — over synthetic
  * frames with the fixture's exact shape and row volumes (sf1 ≈ 1M
  * observations / 1.5M regions at scale 1), in TWO regimes from one
  * generator:
  *
  *  - `dense`:  coordinate span fixed at 100k (the fixture's regime) —
  *    10× rows ⇒ 10× per-position density;
  *  - `spread`: coordinate span ∝ scale (a real genome's regime: more
  *    samples sequence the same genome, but an sf decade in TPC-H-like
  *    data grows the entity space) — density HELD CONSTANT.
  *
  * If the plans are scale-safe and only the fixture densifies, the
  * spread decade's warm-floor ratios land ~1-2× while the dense decade
  * reproduces the ~5×. Warm minimum over reps (the RatioBench reading:
  * one-time plan/codegen/JIT does not multiply with data).
  *
  * Usage: runMain graft.tools.DensityProbe <out.json> [scaleB] [reps]
  * Emits {key: {dense: {a,b,ratio}, spread: {a,b,ratio}}}. */
object DensityProbe {
  def main(args: Array[String]): Unit = {
    val out = if (args.length > 0) args(0) else "target/density_probe.json"
    val scaleB = if (args.length > 1) args(1).toInt else 10
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** The varda fixture's shape at `scale` (sf1-equivalent volumes at
      * scale 1), coordinate span fixed (dense) or ∝ scale (spread). All
      * derivations mirror VardaSql's: 22 chromosomes incl. haploid
      * X/MT, 20 samples with 0/7/14 uncovered, interval length
      * 500-1100, support 1-2, zygosity by id mod 3. */
    def fixtures(scale: Int, spread: Boolean): (DataFrame, DataFrame, DataFrame) = {
      val span = if (spread) 100000L * scale else 100000L
      val chromOf = (k: String) => expr(graft.varda.VardaSql.chromName(k))
      val obs = spark.range(1000000L * scale).select(
        col("id").as("obs_id"),
        chromOf("id % 22").as("chromosome"),
        (lit(1000L) + (col("id") * 37) % span).as("position"),
        expr("substr('ACGT', CAST(id % 4 AS INT) + 1, 1)").as("reference"),
        expr("substr('ACGT', CAST((id + 1) % 4 AS INT) + 1, 1)").as("observed"),
        (col("id") % 20).as("sample_id"),
        (lit(1) + (col("id") % 2)).cast(IntegerType).as("support"),
        when(col("id") % 3 === 0, "homozygous").otherwise("heterozygous")
          .as("zygosity"))
      val cov = spark.range(1500000L * scale)
        .filter((col("id") % 20) % 7 =!= 0) // only covered samples have rows
        .select(
          col("id").as("region_id"),
          chromOf("id % 22").as("chromosome"),
          ((col("id") * 53) % span).as("begin_pos"),
          ((col("id") * 53) % span + 500 + col("id") % 600).as("end_pos"),
          (col("id") % 20).as("sample_id"),
          (lit(1) + (col("id") % 20) % 3).cast(IntegerType).as("pool_size"))
      val smp = spark.range(20).select(
        col("id").as("sample_id"),
        (lit(1) + (col("id") % 20) % 3).cast(IntegerType).as("pool_size"),
        ((col("id") % 20) % 7 =!= 0).as("has_coverage"))
      // no checkpoint: the frames are pure spark.range derivations
      // (codegen'd generation, no IO), so re-evaluation inside each
      // plan is cheaper than pinning 25M-row blocks across regimes —
      // and the declared keys re-read their parquet fixtures the same
      // way
      (obs, cov, smp)
    }

    import graft.varda.VardaOps
    val plans: Seq[(String, (DataFrame, DataFrame, DataFrame) => DataFrame)] = Seq(
      "varda_coverage_join" -> ((o, c, _) => VardaOps.coverageAggBySweep(o, c)),
      "varda_trio_denovo" -> ((o, c, m) => VardaOps.denovoFrom(o, c, m)),
      "varda_sample_retract" -> { (o, c, m) =>
        val gone = Seq(4, 14)
        val st = VardaOps.foldFreqState(VardaOps.emptyFreqState(o, c), o, c, m)
        VardaOps.serveFreqState(VardaOps.retractSample(st,
          o.filter(col("sample_id").isin(gone: _*)),
          m.filter(col("sample_id").isin(gone: _*))))
      })

    def measure(scale: Int, spread: Boolean): Map[String, Double] = {
      val (o, c, m) = fixtures(scale, spread)
      val r = plans.map { case (k, fn) =>
        val secs = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(o, c, m).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[density] $k scale=$scale spread=$spread " +
          f"min=${secs.min}%.2f s (reps: ${secs.map(x => f"$x%.2f").mkString(", ")})")
        k -> secs.min
      }.toMap
      r
    }

    val lines = for (spread <- Seq(false, true)) yield {
      val a = measure(1, spread)
      val b = measure(scaleB, spread)
      val regime = if (spread) "spread" else "dense"
      plans.map(_._1).map { k =>
        val r = b(k) / a(k)
        println(f"[density] $regime $k%-22s a=${a(k)}%7.2f b=${b(k)}%7.2f ratio=$r%5.2f")
        (k, regime, a(k), b(k), r)
      }
    }
    val byKey = lines.flatten.groupBy(_._1)
    val json = byKey.toSeq.sortBy(_._1).map { case (k, rs) =>
      val parts = rs.map { case (_, regime, a, b, r) =>
        f""""$regime": {"a": $a%.3f, "b": $b%.3f, "ratio": $r%.2f}"""
      }
      s""""$k": {${parts.mkString(", ")}}"""
    }.mkString("{", ",\n ", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      json + "\n")
    spark.stop()
  }
}
