package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the persisted IVF index ([[graft.ops.AnnIndex]]) and its
  * declared key `sim_ann_ivf_persist`: recall vs the exact kernel,
  * append-path assignment parity, append visibility, the pruned
  * point-lookup plan, meta maintenance, and load determinism. */
class AnnIndexSpec extends AnyFunSuite {
  import TestSpark._
  import graft.ops.AnnIndex

  private def freshDir(name: String): String = {
    val f = java.nio.file.Files
      .createTempDirectory(s"annidx_$name").toFile
    f.deleteOnExit()
    f.getAbsolutePath
  }

  test("sim_ann_ivf_persist recall vs exact cosine top-5") {
    val exact = ops.Llm.simTopkCosine(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = ops.Llm.simAnnIvfPersist(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    info(s"persisted-ivf recall = $recall over ${exact.size} exact pairs")
    assert(recall >= 0.5, s"recall $recall < 0.5")
  }

  test("declared key is deterministic and serves from the index dir") {
    val a = ops.Llm.simAnnIvfPersist(spark, sf001).collect().toSeq
    val b = ops.Llm.simAnnIvfPersist(spark, sf001).collect().toSeq
    assert(a == b, "repeat invocation diverged")
    assert(a.nonEmpty)
  }

  test("decoy retraction is exact: the served index holds precisely the " +
      "real id set — no real vector tombstoned, no decoy surviving") {
    // round-17 ADVICE: the old +50M decoy offset could collide with
    // GenScale's stacked-copy ids and silently delete REAL vectors.
    // Decoy ids are now negative-odd, structurally disjoint from any
    // non-negative corpus id; this pins the end state id-for-id.
    ops.Llm.simAnnIvfPersist(spark, sf001).collect() // runs the lifecycle
    val idx = ops.Scans.scratch(spark, "ann_ivf_index", sf001)
    val live = spark.read.parquet(s"$idx/vectors")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val real = Tables.embeddings(spark, sf001)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(real.forall(_ >= 0L), "corpus ids not non-negative — the " +
      "decoy disjointness argument would be void")
    assert(live == real,
      s"lost real=${(real -- live).take(5)} leakedDecoy=${(live -- real).take(5)}")
  }

  test("append assigns with the persisted centroids: a clone lands in its original's cell") {
    val dir = freshDir("parity")
    val e = Tables.embeddings(spark, sf001)
    AnnIndex.build(spark, e, dir)
    // append exact copies of 10 existing vectors under fresh ids: the same
    // embedding through the same persisted centroids must land in the
    // same cell — build/append share one assignment rule
    val clones = e.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        col("label"), col("embedding"))
    AnnIndex.append(spark, clones, dir)
    val cells = spark.read.parquet(s"$dir/vectors")
      .filter(col("vec_id") < 10 || col("vec_id") >= 1000000L)
      .select(pmod(col("vec_id"), lit(1000000L)).as("base"), col("cell"))
      .groupBy("base").agg(countDistinct(col("cell")).as("nc"))
      .collect()
    assert(cells.length == 10)
    cells.foreach(r => assert(r.getLong(1) == 1L,
      s"vec ${r.get(0)}: original and clone in different cells"))
  }

  test("appended vectors are served: a planted near-identical neighbor is found") {
    val dir = freshDir("append")
    val e = Tables.embeddings(spark, sf001)
    AnnIndex.build(spark, e, dir)
    val probe = e.filter(col("vec_id") === 3L)
      .select("embedding").head().getAs[scala.collection.Seq[Float]](0).toSeq
    // plant a jittered clone of vec 3 (new id, label 1) AFTER the build
    val clone = e.filter(col("vec_id") === 3L)
      .select(lit(2000003L).as("vec_id"), lit(1).as("label"),
        expr("transform(embedding, x -> x * cast(1.0001 as float))").as("embedding"))
    AnnIndex.append(spark, clone, dir)
    val top = AnnIndex.queryPoint(spark, dir, probe, k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top.contains(2000003L),
      s"appended near-identical clone not in top-2: $top")
    assert(top.contains(3L), s"the probe's own row missing from top-2: $top")
  }

  test("point lookup prunes to the probed cell partitions") {
    val dir = freshDir("prune")
    val e = Tables.embeddings(spark, sf001)
    AnnIndex.build(spark, e, dir)
    val probe = e.filter(col("vec_id") === 7L)
      .select("embedding").head().getAs[scala.collection.Seq[Float]](0).toSeq
    val df = AnnIndex.queryPoint(spark, dir, probe, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"cell probe did not become a PartitionFilter:\n$plan")
    val (_, nCells, _) = AnnIndex.readMeta(spark, dir)
    val scannedCells = spark.read.parquet(s"$dir/vectors")
      .select("cell").distinct().count()
    // the full index has ~nCells populated partitions; the probe plan
    // must touch at most nprobe of them — assert via the scan's file
    // listing (each cell is one directory)
    val files = df.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(files.nonEmpty, "no FileSourceScanExec in point-lookup plan")
    assert(files.head < scannedCells,
      s"point lookup scanned ${files.head} partitions of $scannedCells cells")
  }

  test("streaming maintenance: a vector arriving on a stream is appended and served") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = freshDir("stream")
    val e = Tables.embeddings(spark, sf001)
    AnnIndex.build(spark, e, dir)
    val probe = e.filter(col("vec_id") === 11L)
      .select("embedding").head().getAs[scala.collection.Seq[Float]](0).toSeq
    val jittered = probe.map(x => x * 1.0001f)
    val ms = MemoryStream[(Long, Int, Seq[Float])](spark)
    ms.addData((4000011L, 1, jittered))
    val q = ms.toDF().toDF("vec_id", "label", "embedding")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) => AnnIndex.append(spark, b.toDF(), dir); () }
      .start()
    try q.processAllAvailable() finally q.stop()
    val top = AnnIndex.queryPoint(spark, dir, probe, k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(top.contains(4000011L),
      s"streamed vector not served after foreachBatch append: $top")
  }

  test("streaming retraction: vec_ids arriving on a stream are deleted " +
      "and stop being served") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = freshDir("streamdel")
    val e = Tables.embeddings(spark, sf001)
    AnnIndex.build(spark, e, dir)
    val victim = 13L
    val probe = e.filter(col("vec_id") === victim)
      .select("embedding").head().getAs[scala.collection.Seq[Float]](0).toSeq
    assert(AnnIndex.queryPoint(spark, dir, probe, k = 1)
      .head().getLong(0) == victim)
    // the dedup pipeline's retraction feed: a stream of vec_ids to
    // remove, folded per micro-batch — the delete() counterpart of the
    // append maintenance loop above
    val ms = MemoryStream[Long](spark)
    ms.addData(victim)
    val q = ms.toDF().toDF("vec_id")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) => AnnIndex.delete(spark, b.toDF(), dir); () }
      .start()
    try q.processAllAvailable() finally q.stop()
    val top = AnnIndex.queryPoint(spark, dir, probe, k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(!top.contains(victim),
      s"streamed retraction still served: $top")
    val (n, _, _) = AnnIndex.readMeta(spark, dir)
    assert(n == e.count() - 1, "streamed delete did not maintain the count")
  }

  test("concurrent first invocations build the shared index exactly once") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // a fresh corpus path busts the (session, corpus) memo so BOTH
    // threads race the first build — computeIfAbsent must run the
    // build+append side effects once and block the loser (a get-then-put
    // memo let the loser's overwrite/append interleave into the same
    // directory: duplicated vec_ids or vanishing files)
    val d = java.nio.file.Files.createTempDirectory("annidx_conc")
    java.nio.file.Files.createSymbolicLink(
      d.resolve("embeddings.parquet"),
      java.nio.file.Paths.get(sf0001, "embeddings.parquet"))
    val fn = () => ops.Llm.simAnnIvfPersist(spark, d.toString)
      .collect().map(_.toString).toSeq
    val (f1, f2) = (Future(fn()), Future(fn()))
    val (r1, r2) = (Await.result(f1, 5.minutes), Await.result(f2, 5.minutes))
    assert(r1 == r2, "concurrent first invocations diverged")
    val idx = graft.ops.Scans.scratch(spark, "ann_ivf_index", d.toString)
    val vecs = spark.read.parquet(s"$idx/vectors")
    assert(vecs.count() == vecs.select("vec_id").distinct().count(),
      "racing builders duplicated vectors in the shared index")
    assert(vecs.count() == Tables.embeddings(spark, d.toString).count())
  }

  test("append is TRANSACTIONAL: uncommitted debris is invisible, and a " +
      "replayed append serves exactly once") {
    val dir = freshDir("txn")
    val e = Tables.embeddings(spark, sf001)
    AnnIndex.build(spark, e.filter(col("vec_id") % 3 =!= 0), dir)
    val (n1, _, _) = AnnIndex.readMeta(spark, dir)
    val add = e.filter(col("vec_id") % 3 === 0)
    val probeId = add.select("vec_id").orderBy("vec_id").head().getLong(0)
    val probe = add.filter(col("vec_id") === probeId)
      .select("embedding").head().getAs[scala.collection.Seq[Float]](0).toSeq
    AnnIndex.append(spark, add, dir)
    // CRASH SIMULATION: the generation's vector files landed but the
    // commit marker did not — delete it (the round-16 layout's exact
    // desync window, now closed by the marker being the one commit point)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_commits/gen-1"),
      false))
    // readers serve the PRE-append state: count back, appended vector
    // invisible (it would be its own top-1 at cosine 1.0 if served)
    val (nCrash, _, _) = AnnIndex.readMeta(spark, dir)
    assert(nCrash == n1, s"crashed append leaked into meta: $nCrash != $n1")
    val served = AnnIndex.queryPoint(spark, dir, probe, k = 1)
      .collect().map(_.getLong(0)).toSet
    assert(!served.contains(probeId),
      s"uncommitted generation's vector $probeId was served: $served")
    // REPLAY: the re-run append reclaims the debris and commits — the
    // rows serve exactly once, never duplicated
    AnnIndex.append(spark, add, dir)
    val (n2, _, _) = AnnIndex.readMeta(spark, dir)
    assert(n2 == e.count(), s"replayed append: meta n $n2 != ${e.count()}")
    assert(AnnIndex.queryPoint(spark, dir, probe, k = 1)
      .head().getLong(0) == probeId)
    val vecs = spark.read.parquet(s"$dir/vectors")
      .filter(col("gen") === 1)
    assert(vecs.count() == vecs.select("vec_id").distinct().count()
      && vecs.count() == add.count(),
      "replayed append duplicated (or lost) the crashed generation's rows")
  }

  test("delete (remove_ids) stops serving a vec from BOTH paths; " +
      "re-append restores it") {
    import spark.implicits._
    val dir = freshDir("delete")
    val e = Tables.embeddings(spark, sf001)
    AnnIndex.build(spark, e, dir)
    val victim = 5L
    val probe = e.filter(col("vec_id") === victim)
      .select("embedding").head().getAs[scala.collection.Seq[Float]](0).toSeq
    assert(AnnIndex.queryPoint(spark, dir, probe, k = 1)
      .head().getLong(0) == victim, "sanity: a vector is its own top-1")
    val (n0, _, _) = AnnIndex.readMeta(spark, dir)
    AnnIndex.delete(spark, Seq(victim).toDF("vec_id"), dir)
    // the point-lookup path no longer serves it
    val top = AnnIndex.queryPoint(spark, dir, probe, k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(!top.contains(victim), s"deleted vec $victim still served: $top")
    // the batch query path neither returns it as a neighbor NOR answers
    // for it as a query
    val full = AnnIndex.query(spark, dir, k = 3).collect()
    assert(!full.exists(_.getLong(2) == victim),
      "deleted vec still appears as a neighbor in query()")
    assert(!full.exists(_.getLong(0) == victim),
      "deleted vec still answered as a query in query()")
    val (n1, _, _) = AnnIndex.readMeta(spark, dir)
    assert(n1 == n0 - 1, s"live count after delete: $n1 != ${n0 - 1}")
    // deleting an already-deleted id is a no-op fold (idempotent enough
    // for the caller's retract-then-retract): still not served
    AnnIndex.delete(spark, Seq(victim).toDF("vec_id"), dir)
    assert(!AnnIndex.queryPoint(spark, dir, probe, k = 3)
      .collect().map(_.getLong(0)).contains(victim))
    val (nRedel, _, _) = AnnIndex.readMeta(spark, dir)
    assert(nRedel == n0 - 1,
      "a re-deleted id decremented the live count twice")
    // the retract → re-import cycle: a fresh append under a NEW vec_id
    // serves again (vec_ids are unique across the index's lifetime —
    // the registry discipline, so a restore imports under a fresh id)
    val restored = e.filter(col("vec_id") === victim)
      .select(lit(9000005L).as("vec_id"), col("label"), col("embedding"))
    AnnIndex.append(spark, restored, dir)
    assert(AnnIndex.queryPoint(spark, dir, probe, k = 1)
      .head().getLong(0) == 9000005L)
  }

  test("meta tracks n across appends; dim mismatch is refused") {
    val dir = freshDir("meta")
    val e = Tables.embeddings(spark, sf001)
    AnnIndex.build(spark, e.filter(col("vec_id") % 3 =!= 0), dir)
    val (n1, cells1, dim1) = AnnIndex.readMeta(spark, dir)
    AnnIndex.append(spark, e.filter(col("vec_id") % 3 === 0), dir)
    val (n2, cells2, dim2) = AnnIndex.readMeta(spark, dir)
    assert(n2 == e.count(), s"meta n $n2 != corpus ${e.count()}")
    assert(n2 > n1 && cells1 == cells2 && dim1 == dim2)
    val bad = e.filter(col("vec_id") === 0L)
      .select(lit(3000000L).as("vec_id"), col("label"),
        expr("slice(embedding, 1, 4)").as("embedding"))
    val ex = intercept[IllegalArgumentException] {
      AnnIndex.append(spark, bad, dir)
    }
    assert(ex.getMessage.contains("dim mismatch"))
  }

  test("compact folds adds + deletes into one snap generation: served " +
      "results bit-identical, superseded dirs swept, lifecycle continues") {
    import spark.implicits._
    val dir = freshDir("compact")
    val e = Tables.embeddings(spark, sf001)
    AnnIndex.build(spark, e.filter(col("vec_id") % 3 =!= 0), dir)
    AnnIndex.append(spark, e.filter(col("vec_id") % 3 === 0), dir)
    AnnIndex.delete(spark, Seq(5L, 7L).toDF("vec_id"), dir)
    val (n0, _, _) = AnnIndex.readMeta(spark, dir)
    def served() = AnnIndex.query(spark, dir, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val before = served()
    val probe5 = e.filter(col("vec_id") === 5L)
      .select("embedding").head().getAs[scala.collection.Seq[Float]](0).toSeq

    AnnIndex.compact(spark, dir)

    // semantics: BIT-IDENTICAL serving (no refit — same centroids, same
    // cells), same live count, deleted ids stay gone
    val (n1, _, _) = AnnIndex.readMeta(spark, dir)
    assert(n1 == n0, s"compact changed the live count: $n0 -> $n1")
    assert(served() == before, "compact changed served results")
    assert(!AnnIndex.queryPoint(spark, dir, probe5, k = 3)
      .collect().map(_.getLong(0)).contains(5L),
      "a pre-compact-deleted vec resurfaced after compact")
    // physics: ONE snap generation remains (gens 0=build, 1=append,
    // 2=tombstones are swept; 3 = the snap), tombstones gone entirely
    val gens = spark.read.parquet(s"$dir/vectors")
      .select("gen").distinct().collect().map(_.getInt(0)).toSet
    assert(gens == Set(3), s"expected only the snap generation, got $gens")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/tombstones/gen=2")), "swept tombstones still on disk")
    // round-17 ADVICE: the marker log folds WITH the swept directories
    // — a long-lived maintenance loop must not accrete one FS open per
    // historical generation; only the snap's marker remains
    val markers = fs.listStatus(new org.apache.hadoop.fs.Path(
      s"$dir/_commits")).map(_.getPath.getName).toSet
    assert(markers == Set("gen-3"),
      s"swept generations' markers not folded: $markers")
    // a re-delete of an id the snapshot already folded away is a no-op
    // (the live-set validation, not the tombstone net, is what guards
    // the count now)
    AnnIndex.delete(spark, Seq(5L).toDF("vec_id"), dir)
    val (nRedel, _, _) = AnnIndex.readMeta(spark, dir)
    assert(nRedel == n1, "re-delete after compact corrupted the count")
    // the lifecycle continues: append after compact is served
    val clone = e.filter(col("vec_id") === 11L)
      .select(lit(8000011L).as("vec_id"), col("label"), col("embedding"))
    AnnIndex.append(spark, clone, dir)
    val probe11 = e.filter(col("vec_id") === 11L)
      .select("embedding").head().getAs[scala.collection.Seq[Float]](0).toSeq
    assert(AnnIndex.queryPoint(spark, dir, probe11, k = 2)
      .collect().map(_.getLong(0)).contains(8000011L),
      "post-compact append not served")
  }

  test("a half-written snap generation (crash before the marker) is " +
      "debris: serving unchanged, the replayed compact reclaims it") {
    val dir = freshDir("compactcrash")
    val e = Tables.embeddings(spark, sf001)
    AnnIndex.build(spark, e.filter(col("vec_id") < 150), dir)
    AnnIndex.append(spark, e.filter(col("vec_id") >= 150
      && col("vec_id") < 200), dir)
    def served() = AnnIndex.query(spark, dir, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val before = served()
    // simulate the crash: a PARTIAL snap generation on disk, no marker
    // (same schema as real rows — only the marker blesses a generation)
    spark.read.parquet(s"$dir/vectors").limit(7)
      .withColumn("gen", lit(2))
      .write.mode("overwrite").partitionBy("gen", "cell")
      .parquet(s"$dir/vectors_debris")
    fsMove(s"$dir/vectors_debris/gen=2", s"$dir/vectors/gen=2")
    assert(served() == before,
      "an uncommitted snap generation leaked into serving")
    AnnIndex.compact(spark, dir)
    assert(served() == before, "replayed compact diverged")
    val gens = spark.read.parquet(s"$dir/vectors")
      .select("gen").distinct().collect().map(_.getInt(0)).toSet
    assert(gens == Set(2), s"expected only the replayed snap, got $gens")
  }

  test("compact(retainGens) keeps superseded directories so an in-flight " +
      "cross-process plan stays executable; grace ages out and the " +
      "default compact reclaims everything") {
    val dir = freshDir("retain")
    val e = Tables.embeddings(spark, sf001)
    AnnIndex.build(spark, e.filter(col("vec_id") % 2 === 0), dir)
    AnnIndex.append(spark, e.filter(col("vec_id") % 2 =!= 0), dir)
    def served() = AnnIndex.query(spark, dir, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    def genDir(g: Int) = new java.io.File(s"$dir/vectors/gen=$g")
    val before = served()
    // a plan LISTED before the compact (stand-in for another process's
    // served DataFrame — file listing happens at read creation)
    val oldPlan = AnnIndex.query(spark, dir, k = 3)
    AnnIndex.compact(spark, dir, retainGens = 1)
    // (a) gens superseded by THIS compact retained unconditionally: the
    // old plan still finds every file it listed, new reads see the snap
    assert(genDir(0).exists && genDir(1).exists && genDir(2).exists)
    assert(oldPlan.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2))).toSet == before,
      "a pre-compact plan broke under retention grace")
    assert(served() == before)
    // (b) a second graced compact ages old grace out: of the gens an
    // EARLIER sweep superseded (0, 1) only the newest survives
    AnnIndex.compact(spark, dir, retainGens = 1)
    assert(!genDir(0).exists && genDir(1).exists && genDir(2).exists
      && genDir(3).exists)
    // the final default compact reclaims everything below its snap
    AnnIndex.compact(spark, dir)
    assert(!genDir(1).exists && !genDir(2).exists && !genDir(3).exists
      && genDir(4).exists)
    assert(served() == before, "serving changed across graced compacts")
  }

  test("rebuildIfDrifted: quiet on a fresh index, fires after 7x growth, " +
      "restores the sqrt-n cell count, quiet again after the swap") {
    val dir = freshDir("drift")
    val e = Tables.embeddings(spark, sf001)
    AnnIndex.build(spark, e.filter(col("vec_id") % 7 === 0), dir)
    // factor 1.4 mirrors the declared key: at this 500-row fixture the
    // cellsFor floor of 16 keeps ideal cells (23) inside the default
    // 2x band even after 7x growth
    assert(!AnnIndex.rebuildIfDrifted(spark, dir, factor = 1.4),
      "a just-built index reported drift")
    AnnIndex.append(spark, e.filter(col("vec_id") % 7 =!= 0), dir)
    val (n0, cells0, _) = AnnIndex.readMeta(spark, dir)
    assert(AnnIndex.rebuildIfDrifted(spark, dir, factor = 1.4),
      s"7x-grown index ($cells0 cells for $n0 live) did not trigger")
    val (n1, cells1, _) = AnnIndex.readMeta(spark, dir)
    assert(n1 == n0, s"rebuild changed the live count: $n0 -> $n1")
    assert(cells1 == AnnIndex.cellsFor(n1),
      s"post-rebuild cells $cells1 != design point ${AnnIndex.cellsFor(n1)}")
    assert(!AnnIndex.rebuildIfDrifted(spark, dir, factor = 1.4),
      "freshly swapped index still reports drift")
    // mutations after the swap land in the NEW root (resolveRoot on
    // every entry point): an appended clone is served
    val clone = e.filter(col("vec_id") === 42L)
      .select(lit(7000042L).as("vec_id"), lit(1).as("label"), col("embedding"))
    AnnIndex.append(spark, clone, dir)
    val probe = e.filter(col("vec_id") === 42L)
      .select("embedding").head().getAs[scala.collection.Seq[Float]](0).toSeq
    assert(AnnIndex.queryPoint(spark, dir, probe, k = 2)
      .collect().map(_.getLong(0)).contains(7000042L),
      "post-swap append not served")
  }

  test("rebuildIfDrifted declines on a fully-retracted index instead of " +
      "crashing the maintenance loop") {
    val dir = freshDir("empty")
    val e = Tables.embeddings(spark, sf001).filter(col("vec_id") < 40)
    AnnIndex.build(spark, e, dir)
    AnnIndex.delete(spark, e.select("vec_id"), dir)
    val (n, _, _) = AnnIndex.readMeta(spark, dir)
    assert(n == 0, "fixture: index should be fully retracted")
    assert(!AnnIndex.rebuildIfDrifted(spark, dir, factor = 1.4),
      "an empty index must decline a rebuild, not attempt a refit")
  }

  test("reader-during-swap isolation: a plan listed pre-rebuild executes " +
      "unchanged against the retained root; grace ages out on the next swap") {
    val dir = freshDir("swap")
    val e = Tables.embeddings(spark, sf001)
    AnnIndex.build(spark, e.filter(col("vec_id") % 5 === 0), dir)
    AnnIndex.append(spark, e.filter(col("vec_id") % 5 =!= 0), dir)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2))
    val oldPlan = AnnIndex.query(spark, dir, k = 3) // lists the flat root
    val before = oldPlan.collect().map(key).toSet
    AnnIndex.rebuild(spark, dir)
    // the pre-swap plan still finds every file it listed (flat root is
    // the retained predecessor); new reads serve the refit quantizer
    assert(oldPlan.collect().map(key).toSet == before,
      "a pre-rebuild plan broke during the swap")
    val after = AnnIndex.query(spark, dir, k = 3).collect().map(key).toSet
    assert(after.map(_._1) == before.map(_._1),
      "the refit index lost or invented query ids")
    assert(new java.io.File(s"$dir/v2/vectors").exists,
      "rebuild did not publish a v2 root")
    // second swap: v3 published, the FLAT root (two swaps old) is swept,
    // v2 retained as the new grace
    AnnIndex.rebuild(spark, dir)
    assert(new java.io.File(s"$dir/v3/vectors").exists)
    assert(new java.io.File(s"$dir/v2/vectors").exists,
      "the immediate predecessor version must survive as grace")
    assert(!new java.io.File(s"$dir/vectors").exists
      && !new java.io.File(s"$dir/_commits").exists,
      "the twice-superseded flat layout was not swept")
    assert(AnnIndex.query(spark, dir, k = 3).collect().map(key).toSet
      .map((t: (Long, Int, Long)) => t._1) == before.map(_._1))
  }

  test("sq8 codec: int8 storage serves with >= 0.9 recall vs the f32 twin, " +
      "compact carries codes bit-identically, appended clones are found") {
    val dir8 = freshDir("sq8")
    val dir32 = freshDir("f32twin")
    val e = Tables.embeddings(spark, sf001)
    AnnIndex.build(spark, e, dir8, codec = "sq8")
    AnnIndex.build(spark, e, dir32)
    def pairs(d: String) = AnnIndex.query(spark, d, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val (p8, p32) = (pairs(dir8), pairs(dir32))
    val recall = p32.count(p8.contains).toDouble / p32.size
    info(s"sq8-vs-f32 neighbor agreement = $recall over ${p32.size} pairs")
    assert(recall >= 0.9, s"sq8 recall $recall < 0.9 vs the f32 twin")
    // storage really is int8: the stored column is array<tinyint>
    val schema = spark.read.parquet(s"$dir8/vectors").schema
    assert(schema("qembedding").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType),
      s"sq8 stored schema: $schema")
    // the full lifecycle holds under the codec: append a jittered clone,
    // delete a vector, compact — serving stays consistent
    val probe = e.filter(col("vec_id") === 9L)
      .select("embedding").head().getAs[scala.collection.Seq[Float]](0).toSeq
    val clone = e.filter(col("vec_id") === 9L)
      .select(lit(5000009L).as("vec_id"), lit(1).as("label"),
        expr("transform(embedding, x -> x * cast(1.0001 as float))")
          .as("embedding"))
    AnnIndex.append(spark, clone, dir8)
    assert(AnnIndex.queryPoint(spark, dir8, probe, k = 2)
      .collect().map(_.getLong(0)).contains(5000009L),
      "sq8 append path lost the planted clone")
    import spark.implicits._
    AnnIndex.delete(spark, Seq(9L).toDF("vec_id"), dir8)
    val served = AnnIndex.query(spark, dir8, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    AnnIndex.compact(spark, dir8)
    assert(AnnIndex.query(spark, dir8, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet == served,
      "compact changed sq8 served results — codes must carry, not re-encode")
  }

  test("mutators hold the cross-process writer lock: a foreign holder " +
      "fails append/delete/compact/rebuild/build fast and interleaves " +
      "nothing, breakLock recovers, and a FAILED mutation releases " +
      "its own lock") {
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val dir = freshDir("wlock")
    val e = Tables.embeddings(spark, sf001)
    AnnIndex.build(spark, e, dir)
    // a successful mutation releases the lock
    assert(!Files.exists(Paths.get(dir, "_writer.lock")),
      "build left the writer lock behind")
    def marks = new java.io.File(s"$dir/_commits").list().sorted.toSeq
    val marks0 = marks
    // a concurrent writer (simulated by a stale foreign lock) fails
    // every mutator fast with the holder's identity — the round-18
    // verdict's integrity gap: without this, two maintenance PROCESSES
    // could interleave nextGen and reclaim each other's generations
    Files.write(Paths.get(dir, "_writer.lock"),
      "someone-else 0 other@host".getBytes("UTF-8"))
    val clone = e.filter(col("vec_id") === 3L)
      .select(lit(9000003L).as("vec_id"), col("label"), col("embedding"))
    val ex = intercept[IllegalStateException](
      AnnIndex.append(spark, clone, dir))
    assert(ex.getMessage.contains("another writer holds"), ex.getMessage)
    assert(ex.getMessage.contains("breakLock"), ex.getMessage)
    intercept[IllegalStateException](
      AnnIndex.delete(spark, Seq(3L).toDF("vec_id"), dir))
    intercept[IllegalStateException](AnnIndex.compact(spark, dir))
    intercept[IllegalStateException](AnnIndex.rebuild(spark, dir))
    intercept[IllegalStateException](AnnIndex.build(spark, e, dir))
    // the failed attempts blessed no generation and wiped nothing (the
    // locked build must fail BEFORE its fresh-build wipe)
    assert(marks == marks0, s"foreign-locked mutators interleaved: $marks")
    // operator crash recovery: break the stale lock, work resumes
    AnnIndex.breakLock(spark, dir)
    AnnIndex.append(spark, clone, dir)
    assert(!Files.exists(Paths.get(dir, "_writer.lock")),
      "append left the writer lock behind")
    // a mutation FAILING inside the lock (dim mismatch) must release
    // it, or one bad batch wedges the maintenance loop forever
    val bad = Seq((9000004L, 1, Seq(1f, 2f)))
      .toDF("vec_id", "label", "embedding")
    intercept[IllegalArgumentException](AnnIndex.append(spark, bad, dir))
    assert(!Files.exists(Paths.get(dir, "_writer.lock")),
      "failed append stranded the writer lock")
    AnnIndex.delete(spark, Seq(9000003L).toDF("vec_id"), dir)
  }

  test("queryPointWhere: probe-widening guarantees k under a decimating " +
      "filter (at full width the answer IS the exact filtered set), a " +
      "pass-all predicate matches queryPoint, the plan stays pruned") {
    val dir = freshDir("qwhere")
    val e = Tables.embeddings(spark, sf001)
    AnnIndex.build(spark, e, dir)
    val probe = e.filter(col("vec_id") === 5L)
      .select("embedding").head().getAs[scala.collection.Seq[Float]](0).toSeq
    // only 3 < k survivors exist ANYWHERE in the index: the default
    // probes cannot promise them, so widening must exhaust the cells,
    // and at full width the answer is exactly the filtered set, ranked
    val keep = Seq(7L, 211L, 433L)
    val out = AnnIndex.queryPointWhere(spark, dir, probe, k = 5,
      col("vec_id").isin(keep: _*)).collect()
    assert(out.map(_.getLong(0)).toSet == keep.toSet,
      s"decimating filter lost survivors: ${out.toSeq}")
    val scores = out.map(_.getDecimal(1).doubleValue())
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      s"filtered ranking not descending: ${scores.toSeq}")
    // pass-all predicate: identical to the unfiltered point lookup
    // (same probe set — the widening check finds k immediately)
    val base = AnnIndex.queryPoint(spark, dir, probe, k = 5).collect().toSeq
    val broad = AnnIndex.queryPointWhere(spark, dir, probe, k = 5,
      lit(true)).collect().toSeq
    assert(broad == base,
      s"pass-all filter diverged from queryPoint: $broad vs $base")
    // the filter rides the statically-pruned scan — the queryPoint
    // partition-pruning contract survives the predicate
    val plan = AnnIndex.queryPointWhere(spark, dir, probe, k = 5,
      col("label") >= 0).queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"filtered probe did not become a PartitionFilter:\n$plan")
  }

  private def fsMove(from: String, to: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(from)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(from),
      new org.apache.hadoop.fs.Path(to)))
  }
}
