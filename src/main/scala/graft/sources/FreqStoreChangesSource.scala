package graft.sources

import java.util

import graft.varda.FreqStore
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** CHANGE STREAM over the committed [[FreqStore]] —
  * `spark.readStream.format("freqstore-changes").load(dir)` — the
  * reference's poll-for-new-imports lifecycle [U varda/tasks.py ::
  * import_variation] as a Structured Streaming micro-batch source:
  * each committed generation's obslog DELTA (the ± observation rows
  * that generation appended) becomes a batch, so a downstream
  * streaming aggregate maintains exactly the running state a batch
  * reader would refold from the store.
  *
  * Semantics ride the store's own commit-log algebra:
  *
  *  - **offset space = committed generation ids**
  *    ([[FreqStore.committedIds]]): an offset means "every committed
  *    generation with id <= this has been emitted". The store's
  *    single-writer contract makes ids monotonic (appendGeneration
  *    allocates max+1 under the writer lock), so generation discovery
  *    is a pure commit-log listing — no file-mtime heuristics;
  *  - **a batch is a generation's v0 obslog delta**
  *    ([[FreqStore.obslogDeltaFiles]]): the ORIGINAL append, before any
  *    snapshot netted it. A snapshot's obslog (v >= 1) is the rewrite
  *    of all history below it — not a delta — so once compaction sweeps
  *    a generation's v0 files the generation is NOT streamable and the
  *    stream FAILS LOUDLY at plan time (the same addressability
  *    contract [[FreqStore.serveAsOf]] enforces; a silently empty batch
  *    would desync every downstream aggregate). Size the store's
  *    `compact(retainGens = …)` grace window to the stream's maximum
  *    expected lag;
  *  - an EMPTY batch is legitimate: an all-coverage commit appends no
  *    observation rows but still advances the offset;
  *  - rows carry their `generation`, so per-batch provenance survives
  *    downstream aggregation (`max(generation)` is the streamed
  *    analogue of the commit-log high-water mark).
  *
  * `option("startingGeneration", g)` begins at generation `g` instead
  * of the oldest addressable one (the usual "bootstrap from a batch
  * `serveAsOf(g-1)`, then stream the tail" split). Reading starts at
  * plan time from a LIVE listing, so a stream started after compaction
  * must either start above the snapshot floor or fail — exactly like a
  * restart from an old checkpoint.
  *
  * Production trigger semantics ([[SupportsTriggerAvailableNow]]):
  * `option("maxGensPerTrigger", n)` bounds each micro-batch to n
  * generations — the admission unit is a GENERATION, never a row,
  * because a transactional commit's delta must land whole in one batch
  * — so a backlogged restart drains in bounded batches instead of one
  * giant catchup plan. `Trigger.AvailableNow` pins the target
  * generation at query start, drains up to it (in `maxGensPerTrigger`
  * steps when set) and terminates; commits landing mid-run wait for
  * the next invocation.
  *
  * **The denominator side streams too** (round 16): by default the feed
  * is the legacy obslog-only form, but
  * `option("components", "obslog,cover,registry")` (or `"all"`) switches
  * to a MULTIPLEXED wide schema carrying, per generation, all three
  * append-store deltas — observation rows (`component = 'obs'`), SIGNED
  * coverage-log fragments (`'cover'` — the covlog component: +segments
  * newly covered by a commit, -fragments removed by a retraction) and
  * sample-registry rows (`'registry'`, ± pool deltas). One generation's
  * three deltas land atomically in ONE micro-batch (the admission unit
  * is still a generation), so a downstream consumer can maintain
  * FREQUENCIES, not just numerators: [[graft.varda.FreqStore.refoldChanges]]
  * rebuilds the `serve()` frame bit-exactly from the drained feed alone
  * — the reference's continuous-import lifecycle folds coverage
  * continuously [U varda/tasks.py :: import_coverage], and this is its
  * CDC read side. Generations written before the covlog component
  * existed fail LOUDLY when `cover` is requested (the same
  * addressability discipline as the compaction floor) instead of
  * streaming a silently incomplete generation.
  *
  * Executor-side reading is parquet-mr over the fixed component schemas
  * (the same zero-Spark-internals read path the batch DSv2 scan uses);
  * one [[InputPartition]] per delta file keeps a large import's replay
  * parallel while tiny deltas stay single-task. */
class FreqStoreChangesSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "freqstore-changes"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FreqStoreChangesSource.schemaFor(
      FreqStoreChangesSource.parseComponents(options.get("components")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DataSourceV2Utils hands getTable the ORIGINAL-CASE option map —
    // re-wrap it case-insensitively so a miscased `Components` cannot
    // silently fall back to the legacy narrow feed (round-16 review:
    // every other option of this source is case-insensitive)
    val opts = new CaseInsensitiveStringMap(properties)
    val dir = Option(opts.get("path")).getOrElse(
      sys.error("freqstore-changes source needs a path: " +
        "spark.readStream.format(\"freqstore-changes\").load(dir)"))
    new FreqStoreChangesTable(dir,
      FreqStoreChangesSource.parseComponents(opts.get("components")))
  }
}

object FreqStoreChangesSource {
  /** The obslog component schema plus the generation id that appended
    * each row. `sample_id` is null for anonymous observations (an
    * import without sample tags). */
  val schema: StructType = StructType(Seq(
    StructField("generation", LongType, nullable = false),
    StructField("chromosome", StringType), StructField("position", LongType),
    StructField("reference", StringType), StructField("observed", StringType),
    StructField("sample_id", LongType), StructField("support", LongType)))

  /** The MULTIPLEXED schema (the `components` option): one row stream
    * tagged by `component`, so one generation's three deltas share a
    * micro-batch. Per component the populated columns are
    *
    *  - `obs`: chromosome, position, reference, observed, sample_id
    *    (null = anonymous), support (± — tombstones are negative),
    *  - `cover`: chromosome, cell, fbegin, fend, sample_id, pool_size
    *    (SIGNED: + newly-covered segment, - retracted fragment),
    *  - `registry`: sample_id, pool_size (± delta), has_coverage;
    *
    * everything else null. `pool_size` widens to LONG so consumer sums
    * need no cast. */
  val wideSchema: StructType = StructType(Seq(
    StructField("generation", LongType, nullable = false),
    StructField("component", StringType, nullable = false),
    StructField("chromosome", StringType), StructField("position", LongType),
    StructField("reference", StringType), StructField("observed", StringType),
    StructField("sample_id", LongType), StructField("support", LongType),
    StructField("cell", LongType), StructField("fbegin", LongType),
    StructField("fend", LongType), StructField("pool_size", LongType),
    StructField("has_coverage", BooleanType)))

  /** Feed components in canonical order. `None` = the option was not
    * given: the legacy obslog-only narrow schema (backward compat for
    * checkpointed streams). Any explicit option value — even just
    * `obslog` — selects the wide multiplexed schema. */
  private[graft] def parseComponents(opt: String): Option[Seq[String]] =
    Option(opt).map { s =>
      val all = Seq("obslog", "cover", "registry")
      val asked =
        if (s.trim.equalsIgnoreCase("all")) all
        else s.split(',').map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq
      val bad = asked.filterNot(all.contains)
      require(bad.isEmpty && asked.nonEmpty,
        s"freqstore-changes: components must be a comma list drawn from " +
          s"${all.mkString("{", ", ", "}")} (or 'all'); got '$s'")
      all.filter(asked.contains)
    }

  private[graft] def schemaFor(components: Option[Seq[String]]): StructType =
    if (components.isEmpty) schema else wideSchema

  /** option component name → the store's append component it streams. */
  private[graft] val storeComponent: Map[String, String] = Map(
    "obslog" -> "obslog", "cover" -> "covlog", "registry" -> "smpreg")
}

class FreqStoreChangesTable(dir: String, components: Option[Seq[String]])
    extends Table with SupportsRead {
  override def name(): String = s"freqstore-changes:$dir"
  override def schema(): StructType =
    FreqStoreChangesSource.schemaFor(components)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val startAt = Option(options.get("startingGeneration")).map { s =>
      s.toLongOption.getOrElse(sys.error(
        s"freqstore-changes: startingGeneration must be a long generation " +
          s"id, got '$s'"))
    }
    val maxGens = Option(options.get("maxGensPerTrigger")).map { s =>
      val n = s.toIntOption.getOrElse(sys.error(
        s"freqstore-changes: maxGensPerTrigger must be a positive int, " +
          s"got '$s'"))
      require(n > 0, s"freqstore-changes: maxGensPerTrigger must be " +
        s"positive, got $n")
      n
    }
    new ScanBuilder {
      override def build(): Scan =
        new FreqStoreChangesScan(dir, startAt, maxGens, components)
    }
  }
}

class FreqStoreChangesScan(dir: String, startAt: Option[Long],
    maxGens: Option[Int], components: Option[Seq[String]]) extends Scan {
  override def readSchema(): StructType =
    FreqStoreChangesSource.schemaFor(components)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FreqStoreChangesStream(dir, startAt, maxGens, components)
  override def description(): String = s"FreqStoreChangesScan($dir)"
}

/** Offset = the highest generation id already emitted (−1 before any).
  * JSON form `{"lastGen": N}` in the checkpoint log. */
case class FreqStoreChangesOffset(lastGen: Long) extends Offset {
  override def json(): String = s"""{"lastGen":$lastGen}"""
}

class FreqStoreChangesStream(dir: String, startAt: Option[Long],
    maxGens: Option[Int] = None, components: Option[Seq[String]] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  /** A FRESH store instance per log question: the stream polls a live
    * store mutated by another process (the ingest loop), so per-call
    * construction is what keeps the commit-log cache from going stale
    * (FreqStore's cache contract assumes the mutator is the same
    * instance). Constructor nBuckets only seeds NEW stores — reads
    * resolve the modulus from the log. */
  private def store: FreqStore = new FreqStore(SparkSession.active, dir)

  private def floorGen: Long = startAt.map(_ - 1).getOrElse(-1L)

  /** `Trigger.AvailableNow` pin: the target generation is captured ONCE
    * at query start, so commits landing while the catchup runs are the
    * NEXT run's work and the query is guaranteed to terminate — the
    * trigger's contract. */
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(store.committedIds.maxOption.getOrElse(floorGen))

  override def initialOffset(): Offset = FreqStoreChangesOffset(floorGen)

  /** ADMISSION CONTROL: the unit is a GENERATION, not a row — a
    * transactional commit's delta must land in one batch (splitting it
    * would expose half a commit to the downstream aggregate), so
    * `maxGensPerTrigger` caps generations per micro-batch and
    * `ReadLimit.maxRows` is interpreted the same way (the engine's
    * default rate limit knob; row-exact capping cannot hold the
    * transaction boundary). A backlogged restart then drains in
    * bounded batches instead of planning one giant catchup batch. */
  override def getDefaultReadLimit: ReadLimit =
    maxGens.map(n => ReadLimit.maxRows(n.toLong))
      .getOrElse(ReadLimit.allAvailable())

  private def maxRowsOf(limit: ReadLimit): Option[Long] = limit match {
    case m: ReadMaxRows => Some(m.maxRows())
    case c: CompositeReadLimit =>
      c.getReadLimits.toSeq.flatMap(maxRowsOf).minOption
    case _ => None // allAvailable / minRows etc: no cap
  }

  /** The ROW-limit-as-GENERATION-limit reinterpretation is documented
    * but invisible to operators (round-15 ADVICE) — log it ONCE per
    * stream so an engine-injected row cap is observable. */
  @volatile private var loggedRowCapReinterpretation = false
  private def noteRowCap(n: Long): Unit =
    if (!loggedRowCapReinterpretation) {
      loggedRowCapReinterpretation = true
      System.err.println(s"freqstore-changes: interpreting a " +
        s"ReadLimit.maxRows($n) admission cap as $n GENERATIONS per " +
        "micro-batch — a transactional commit's delta must land whole " +
        "in one batch, so row-exact capping cannot hold the " +
        "transaction boundary")
    }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    // the CHECKPOINT offset wins over startingGeneration (the Kafka
    // startingOffsets convention): the option seeds initialOffset()
    // only — flooring it in here would make a restart with a higher
    // startingGeneration silently skip committed generations the
    // checkpoint had not yet consumed
    val lo = start.asInstanceOf[FreqStoreChangesOffset].lastGen
    var ids = store.committedIds.filter(_ > lo)
    availableNowCap.foreach(cap => ids = ids.filter(_ <= cap))
    maxRowsOf(limit).foreach { n =>
      noteRowCap(n)
      ids = ids.take(math.max(1L, n).min(Int.MaxValue).toInt)
    }
    FreqStoreChangesOffset(if (ids.isEmpty) lo else ids.max)
  }

  override def reportLatestOffset(): Offset =
    FreqStoreChangesOffset(store.committedIds.maxOption.getOrElse(floorGen))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this " +
        "method (freqstore-changes implements SupportsAdmissionControl)")

  override def deserializeOffset(json: String): Offset = {
    val m = """\{"lastGen":(-?\d+)\}""".r
    json.trim match {
      case m(g) => FreqStoreChangesOffset(g.toLong)
      case other => sys.error(s"freqstore-changes: unreadable offset '$other'")
    }
  }

  /** The spelled-out recovery paths every loud plan-time failure names.
    * `startingGeneration` only seeds a FRESH checkpoint's initial
    * offset (the checkpoint-wins rule), so recovery from a pinned WAL
    * batch requires a new checkpoint location. */
  private def recovery: String =
    "start a NEW checkpoint above the snapshot floor (startingGeneration " +
      "only seeds a fresh checkpoint's initial offset), re-bootstrap " +
      "from a batch serveAsOf, or retain a longer compact(retainGens=…) " +
      "grace window"

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[FreqStoreChangesOffset].lastGen
    val hi = end.asInstanceOf[FreqStoreChangesOffset].lastGen
    // ONE fresh store instance for the whole plan: one live names-only
    // log listing decides the batch's membership, one cached content
    // read serves every obslogDeltaFiles call — no O(gens × markers)
    // re-listing
    val st = store
    val names = st.markerNames
    val ids = names.map(_._1).distinct.sorted
    val listed = ids.filter(g => g > lo && g <= hi)
    // COMPLETENESS below the snapshot floor: compaction erases the
    // consolidated generations' markers outright, so a swept generation
    // does not show up in `listed` at all — intersecting with the live
    // listing alone would silently SKIP it and permanently desync every
    // downstream aggregate. Generation ids are NOT necessarily dense
    // (the ingest wave commits 2b always but 2b+1 only when retractions
    // exist; bulk imports name their own ids), so absence alone proves
    // nothing. What IS provable: [[FreqStore.sweepSuperseded]] ages v0
    // markers out OLDEST FIRST (keepGens = takeRight of the newest,
    // plus the just-consolidated protectNow set), so the surviving v0
    // markers at or below the floor are a SUFFIX of the true committed
    // history there — every erased id is older than the oldest
    // survivor. A batch range is therefore provably complete iff it
    // starts at or above that oldest surviving delta; anything earlier
    // MAY contain erased history and must fail loudly.
    val snapFloor = names.filter(_._2 > 0).map(_._1).maxOption
    for (s <- snapFloor if lo < s) {
      val v0Below = names.collect { case (id, 0) if id <= s => id }
      val oldest = v0Below.minOption
      if (!oldest.exists(lo + 1 >= _))
        sys.error(s"freqstore-changes: generations at or below the " +
          s"gen-$s snapshot floor of $dir are no longer streamable from " +
          s"offset $lo — compaction consolidated that history" +
          oldest.fold("")(o => s" (oldest surviving delta: gen-$o)") +
          s"; $recovery")
    }
    // WITHDRAWAL race (checked AFTER floor completeness — an hi erased
    // by compaction is the permanent case above, not this transient
    // one): `hi` was a listed committed id when the offset was pinned
    // (latestOffset returned it), so its absence now proves a marker
    // withdrawal in the pin-to-plan window — the ingest wave replay's
    // unmarkGeneration(2b+1) is exactly this shape. Planning without it
    // would advance the offset past a generation the replay is about to
    // RECOMMIT — a silent permanent skip. Fail loudly instead; once the
    // replay recommits, a restart finds hi listed again and resumes
    // losslessly. (Withdrawals strictly between lo and hi cannot occur:
    // the single-maintenance-loop contract replays a wave before any
    // later wave commits, so a withdrawn marker is always the newest
    // committed id — i.e. hi — when in range.)
    if (hi > lo && !ids.contains(hi))
      sys.error(s"freqstore-changes: generation $hi of $dir was listed " +
        "when this batch's offset was pinned but its marker is now " +
        "withdrawn (a crash-replayed ingest wave re-folding in place) — " +
        "the batch is temporarily unplannable, not lost: restart the " +
        "stream after the replay recommits the generation")
    val comps = components.getOrElse(Seq("obslog"))
    val wide = components.isDefined
    listed.flatMap { g =>
      comps.flatMap { c =>
        val storeComp = FreqStoreChangesSource.storeComponent(c)
        // a generation written before the covlog component existed has
        // NO cover delta to stream — emitting the generation without it
        // would hand the consumer a numerator update with no matching
        // denominator delta, a silent permanent desync. (The obslog and
        // smpreg components have existed since the store's first
        // layout, so only covlog can be absent.)
        if (c == "cover" && !st.hasDeltaComponent(storeComp, g)
            && st.obslogDeltaFiles(g).isDefined)
          sys.error(s"freqstore-changes: generation $g of $dir was " +
            "written before the coverage change log (covlog) existed — " +
            "its cover delta cannot be streamed; re-import the store " +
            "with a covlog-writing build, or stream components=obslog")
        st.deltaFiles(storeComp, g) match {
          case None =>
            // the addressability contract: the generation committed (its
            // id is in the log) but its v0 delta is gone — compaction
            // consolidated it below a snapshot. Serving the netted
            // snapshot as if it were this generation's delta would
            // double- or under-count every downstream aggregate.
            sys.error(s"freqstore-changes: generation $g of $dir is no " +
              "longer streamable — compaction swept its original (v0) " +
              s"$storeComp delta; $recovery")
          case Some(files) =>
            files.map(f =>
              FreqStoreChangesPartition(g, f, c, wide): InputPartition)
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FreqStoreChangesReaderFactory(
      FreqStoreDataSource.sessionHadoopConfMap(SparkSession.active))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** `component` names the FEED component ("obslog"/"cover"/"registry");
  * `wide` selects the multiplexed 13-column row form (the legacy
  * obslog-only stream keeps its original 7-column rows so checkpointed
  * consumers never see a schema change). */
case class FreqStoreChangesPartition(generation: Long, file: String,
    component: String = "obslog", wide: Boolean = false)
    extends InputPartition

class FreqStoreChangesReaderFactory(hadoopConf: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new FreqStoreChangesPartitionReader(
      p.asInstanceOf[FreqStoreChangesPartition], hadoopConf)
}

/** One delta file → rows in the partition's declared form: the legacy
  * narrow obslog rows, or the wide multiplexed rows with the
  * non-component columns null. */
class FreqStoreChangesPartitionReader(p: FreqStoreChangesPartition,
    hadoopConf: Map[String, String]) extends PartitionReader[InternalRow] {
  import org.apache.parquet.example.data.Group

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new Path(p.file))
      .withConf(GroupReads.hadoopConf(hadoopConf)).build()
  private var cur: InternalRow = _

  private def optLong(g: Group, field: String): Any =
    if (g.getFieldRepetitionCount(field) > 0)
      java.lang.Long.valueOf(g.getLong(field, 0))
    else null

  /** component tag interned once per partition, not per row. */
  private val tag = UTF8String.fromString(p.component match {
    case "obslog" => "obs"
    case other => other
  })

  override def next(): Boolean = {
    val g = reader.read()
    if (g == null) { cur = null; return false }
    cur =
      if (!p.wide)
        new GenericInternalRow(Array[Any](
          p.generation,
          GroupReads.utf8(g, "chromosome"),
          g.getLong("position", 0),
          GroupReads.utf8(g, "reference"),
          GroupReads.utf8(g, "observed"),
          optLong(g, "sample_id"),
          g.getLong("support", 0)))
      else p.component match {
        case "obslog" => new GenericInternalRow(Array[Any](
          p.generation, tag,
          GroupReads.utf8(g, "chromosome"),
          g.getLong("position", 0),
          GroupReads.utf8(g, "reference"),
          GroupReads.utf8(g, "observed"),
          optLong(g, "sample_id"),
          g.getLong("support", 0),
          null, null, null, null, null))
        case "cover" => new GenericInternalRow(Array[Any](
          p.generation, tag,
          GroupReads.utf8(g, "chromosome"),
          null, null, null,
          java.lang.Long.valueOf(g.getLong("sample_id", 0)),
          null,
          g.getLong("cell", 0),
          g.getLong("fbegin", 0),
          g.getLong("fend", 0),
          g.getInteger("pool_size", 0).toLong,
          null))
        case _ => new GenericInternalRow(Array[Any](
          p.generation, tag,
          null, null, null, null,
          java.lang.Long.valueOf(g.getLong("sample_id", 0)),
          null, null, null, null,
          g.getInteger("pool_size", 0).toLong,
          java.lang.Boolean.valueOf(g.getBoolean("has_coverage", 0))))
      }
    true
  }
  override def get(): InternalRow = cur
  override def close(): Unit = reader.close()
}
