package graft.sources

import java.util

import graft.varda.FreqStore
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Catalog registration for the freqstore serving tables — the piece
  * that unlocks Spark's STORAGE-PARTITIONED planning over the store:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.freq",
  *     "graft.sources.FreqStoreCatalog")
  *   spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
  *   spark.table("freq.`/path/to/store`")   // table name IS the path
  * }}}
  *
  * The plain `spark.read.format("freqstore")` path cannot express this:
  * Spark only resolves a scan's reported partitioning through the
  * relation's catalog (`V2ScanPartitioningAndOrdering` needs a
  * [[FunctionCatalog]] to bind the transform), so a provider-loaded
  * table always degrades to UnknownPartitioning. Through the catalog,
  * the table declares `point_bucket_<n>(position)` — the store's shared
  * bucket function (single-argument: catalyst KeyGroupedPartitioning
  * supports one-child transforms only, the reason the round-12 layout
  * dropped the chromosome from the hash), modulus IN THE NAME so two
  * stores only co-partition when their moduli match. Each scan
  * partition reports its bucket id
  * as its partition key ([[org.apache.spark.sql.connector.read.HasPartitionKey]]),
  * so Catalyst plans over `KeyGroupedPartitioning`:
  *
  *  - `GROUP BY chromosome, position` aggregates with ZERO exchange —
  *    same (chromosome, position) can only live in one bucket;
  *  - a store⟗store equi-join on the point key (cohort vs cohort)
  *    becomes a storage-partitioned join — neither side shuffles.
  *
  * Mutations: observation appends work as standard SQL —
  * `INSERT INTO fqs.`…` (chromosome, position, reference, observed,
  * numer) SELECT …` lands as ONE transactional generation through
  * [[FreqStore.commit]]'s path (writer lock, marker, replay contract;
  * see [[FreqStoreInsertable]]) — and sample deactivation works as
  * standard SQL DELETE on the observation-log component view
  * (round 16): `DELETE FROM fqs.`…#obslog` WHERE sample_id IN (…)`
  * maps to the retraction fold ([[FreqStoreObslogTable]]). Everything
  * else in the MUTATING lifecycle — full batches with coverage/samples,
  * compaction — is exposed as stored PROCEDURES (the reference runs
  * those as task endpoints [U varda/tasks.py], not row-level DML), and
  * DDL (create/alter/drop) is rejected:
  *
  * {{{
  *   CALL fqs.import_batch('/store', 1, 'obs_view', 'cov_view', 'smp_view')
  *   CALL fqs.retract_samples('/store', 2, array(7L, 9L))
  *   CALL fqs.compact('/store', 2)      -- retain_gens = 2
  *   CALL fqs.break_lock('/store')
  * }}} */
class FreqStoreCatalog extends TableCatalog with FunctionCatalog
    with ProcedureCatalog {
  private var catName: String = _
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name
  override def name(): String = catName

  /** The identifier's NAME is the store directory (quote it in SQL:
    * ``freq.`/path/to/store` ``); namespaces are not used. A
    * NONEXISTENT directory is a missing table, loudly — the provider
    * path's "empty store reads empty" contract is for a CREATED store
    * awaiting its first commit, not for a typo'd path silently serving
    * an empty cohort. */
  override def loadTable(ident: Identifier): Table = {
    requireRootNamespace(ident)
    // `/path/to/store#obslog` selects the observation-log component
    // view (round 16): readable audit log + the DELETE surface mapping
    // `WHERE sample_id IN (…)` to the retraction fold
    FreqStoreCatalog.componentOf(ident.name()) match {
      case Some((dir, "obslog")) =>
        requireStoreDir(dir)
        new FreqStoreObslogTable(dir)
      case Some((_, comp)) =>
        sys.error(s"freqstore: no component view '#$comp' " +
          s"(in '${ident.name()}') — available: #obslog")
      case None =>
        requireStoreDir(ident.name())
        new FreqStoreTable(ident.name(), catalogPartitioned = true)
    }
  }

  /** Same guard as the procedure side: a namespaced identifier
    * (`fqs.ns.store`) must not silently resolve by its LAST part —
    * that reads a different store than the user named. */
  private def requireRootNamespace(ident: Identifier): Unit =
    if (ident.namespace().nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catName) ++ ident.namespace() ++ Seq(ident.name()))

  private def requireStoreDir(dir: String): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catName, dir))
  }

  /** SQL-standard time travel — `SELECT … FROM fqs.`…` VERSION AS OF g`
    * resolves here: the version string is a generation id, pinned with
    * [[graft.varda.FreqStore.serveAsOf]]'s validation (a generation
    * consolidated away by compaction fails at plan time). Composes with
    * the storage-partitioned planning: a drift join `head ⟕ VERSION AS
    * OF g` of the SAME store co-partitions and shuffles neither side. */
  override def loadTable(ident: Identifier, version: String): Table = {
    requireRootNamespace(ident)
    requireNoComponent(ident, "VERSION AS OF")
    val asOf = version.toLongOption.getOrElse(sys.error(
      s"freqstore: VERSION AS OF takes a generation id, got '$version'"))
    requireStoreDir(ident.name())
    new FreqStoreTable(ident.name(), catalogPartitioned = true,
      asOfFixed = Some(asOf))
  }

  /** Component views do not time-travel (audit reads pin history with
    * the MAIN table's AS OF; the log view always shows the full
    * retained log) — fail loudly rather than silently serving the head. */
  private def requireNoComponent(ident: Identifier, what: String): Unit =
    FreqStoreCatalog.componentOf(ident.name()).foreach { case (_, c) =>
      sys.error(s"freqstore: $what is not supported on the #$c component " +
        s"view ('${ident.name()}') — time-travel the main table instead")
    }
  /** SQL-standard wall-clock time travel — `SELECT … FROM fqs.`…`
    * TIMESTAMP AS OF '2026-08-01 12:00:00'`. The DSv2 contract hands the
    * timestamp in MICROSECONDS since the epoch; it resolves to the
    * newest generation whose commit marker mtime is at or before it
    * ([[graft.varda.FreqStore.generationAt]]), then pins the scan
    * exactly like `VERSION AS OF` — including serveAsOf's plan-time
    * validation, so a timestamp below the snapshot floor fails loudly.
    * A timestamp before the store's first commit is an error. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    requireRootNamespace(ident)
    requireNoComponent(ident, "TIMESTAMP AS OF")
    requireStoreDir(ident.name())
    val gen = new FreqStore(org.apache.spark.sql.SparkSession.active,
      ident.name()).generationAt(Math.floorDiv(timestamp, 1000L))
    new FreqStoreTable(ident.name(), catalogPartitioned = true,
      asOfFixed = Some(gen))
  }

  // only "no such table" means "does not exist" — a transient fs /
  // permission / layout-version failure must surface, not read as absent
  override def tableExists(ident: Identifier): Boolean =
    try { loadTable(ident); true }
    catch {
      case _: org.apache.spark.sql.catalyst.analysis.NoSuchTableException =>
        false
    }
  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // tables are paths; there is nothing to enumerate
  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "freqstore tables are created by FreqStore.commit, not SQL DDL")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("freqstore tables are read-only")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("freqstore tables are read-only")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("freqstore tables are read-only")

  override def loadFunction(ident: Identifier): UnboundFunction =
    FreqStoreCatalog.parseBucketFn(ident.name()).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(
        ident))
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array.empty // moduli are per-store; names resolve on demand
  override def functionExists(ident: Identifier): Boolean =
    FreqStoreCatalog.parseBucketFn(ident.name()).isDefined

  /** `CALL fqs.<procedure>(…)` — Spark 4's stored-procedure surface
    * (analyzer-invoked: ResolveProcedures binds, InvokeProcedures runs
    * the call eagerly and plans the returned [[LocalScan]] rows as the
    * statement's result). */
  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    // namespaces are not used (same as the table side): a namespaced
    // identifier is a typo, and a MUTATING call must not resolve under
    // a namespace that does not exist
    require(ident.namespace().isEmpty,
      s"freqstore: procedures live at the catalog root — " +
        s"'${ident.namespace().mkString(".")}.${ident.name()}' names a " +
        "namespace that does not exist")
    FreqStoreCatalog.procedures.getOrElse(ident.name(), sys.error(
      s"freqstore: no procedure '${ident.name()}' — available: " +
        FreqStoreCatalog.procedures.keys.toSeq.sorted.mkString(", ")))
  }
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.nonEmpty) Array.empty
    else FreqStoreCatalog.procedures.keys.toArray.sorted
      .map(Identifier.of(Array.empty[String], _))
}

object FreqStoreCatalog {
  /** `"<dir>#<component>"` → (dir, component); None for a plain store
    * path. Split at the LAST '#' so a (pathological) directory name
    * containing '#' still addresses its components. */
  private[sources] def componentOf(name: String): Option[(String, String)] = {
    val i = name.lastIndexOf('#')
    if (i < 0) None else Some((name.substring(0, i), name.substring(i + 1)))
  }

  private val BucketFn = "point_bucket_(\\d+)".r
  private[sources] def parseBucketFn(name: String): Option[UnboundFunction] =
    name match {
      case BucketFn(n) => Some(new PointBucketUnbound(n.toInt))
      case _ => None
    }
  private[sources] def transformFor(n: Int): Transform =
    Expressions.apply(s"point_bucket_$n", Expressions.column("position"))

  private[sources] val procedures: Map[String, UnboundProcedure] = Map(
    "import_batch" -> new ImportBatchProcedure,
    "retract_samples" -> new RetractSamplesProcedure,
    "compact" -> new CompactProcedure,
    "show_generations" -> new ShowGenerationsProcedure,
    "break_lock" -> new BreakLockProcedure)
}

/** Result rows of a procedure, planned by Spark's InvokeProcedures as
  * a local relation (mutating procedures emit one status row; the
  * inspection procedures emit one row per fact). */
private[sources] case class ProcedureResult(schema: StructType,
    rowValues: Seq[Seq[Any]]) extends LocalScan {
  override def readSchema(): StructType = schema
  override def rows(): Array[InternalRow] =
    rowValues.map(InternalRow.fromSeq).toArray
}

/** Shared shape: every freqstore procedure is both the unbound and the
  * bound form (parameters are static — the analyzer's argument coercion
  * checks types, [[str]]-style guards check null/range at call time),
  * side-effecting
  * (`isDeterministic = false` keeps Catalyst from caching/reordering
  * the call) and returns exactly one status row. */
private[sources] abstract class FreqStoreProcedure(pname: String)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = pname
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  protected def spark: org.apache.spark.sql.SparkSession =
    org.apache.spark.sql.SparkSession.active
  protected def result(fields: (String, DataType)*)(values: Any*):
      java.util.Iterator[Scan] =
    resultRows(fields: _*)(Seq(values))
  protected def resultRows(fields: (String, DataType)*)(
      rows: Seq[Seq[Any]]): java.util.Iterator[Scan] = {
    val schema = StructType(fields.map { case (f, t) =>
      StructField(f, t, nullable = false) })
    java.util.List.of[Scan](ProcedureResult(schema, rows)).iterator()
  }
  protected def in(n: String, t: DataType): ProcedureParameter =
    ProcedureParameter.in(n, t).build()
  protected def inDefault(n: String, t: DataType,
      default: String): ProcedureParameter =
    ProcedureParameter.in(n, t).defaultValue(default).build()
  /** Argument coercion checks TYPES only — null/range validation is the
    * procedure's job, at the CALL boundary, before any store work. */
  protected def str(input: InternalRow, i: Int, what: String): String = {
    require(!input.isNullAt(i), s"$pname: $what must not be NULL")
    val s = input.getUTF8String(i).toString
    require(s.nonEmpty, s"$pname: $what must not be empty")
    s
  }
}

/** `CALL fqs.import_batch(store, batch_id, observations, coverage,
  * samples)` — the reference's import task [U POST /imports] as one
  * SQL statement: folds the three named views (observation rows,
  * BED-shaped coverage, sample registrations — [[FreqStore.commit]]'s
  * exact contract) into the store as generation `batch_id`. The views
  * resolve in the CALLING session (temp views included), so a pipeline
  * can stage with DataFrames and commit from SQL. `n_buckets` sizes a
  * NEW store's bucket modulus; an existing store keeps its committed
  * modulus regardless (the commit log is authoritative —
  * [[FreqStore]]'s nBkts contract). */
private[sources] class ImportBatchProcedure
    extends FreqStoreProcedure("import_batch") {
  override def parameters(): Array[ProcedureParameter] = Array(
    in("store", StringType), in("batch_id", LongType),
    in("observations", StringType), in("coverage", StringType),
    in("samples", StringType),
    inDefault("n_buckets", IntegerType, "16"))
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = str(input, 0, "store")
    val batchId = input.getLong(1)
    // scalar validation first: a bad n_buckets must fail before any
    // view resolves or store work starts
    val nBuckets = input.getInt(5)
    require(nBuckets > 0, s"import_batch: n_buckets must be positive, " +
      s"got $nBuckets")
    val Seq(obs, cov, smp) = Seq(
      ("observations", 2), ("coverage", 3), ("samples", 4)).map {
      case (what, i) => spark.table(str(input, i, what)) }
    new FreqStore(spark, dir, nBuckets).commit(batchId, obs, cov, smp)
    result("store" -> StringType, "generation" -> LongType)(
      UTF8String.fromString(dir), batchId)
  }
  override def description(): String =
    "fold one import batch (observations/coverage/samples views) into " +
      "the store as the given generation"
}

/** `CALL fqs.retract_samples(store, batch_id, sample_ids)` — sample
  * deactivation [U varda/models.py :: sample lifecycle] from the store
  * alone: the samples' net observations are derived from the obslog
  * registry ([[FreqStore.retractSamples]]), so the call needs only the
  * ids. */
private[sources] class RetractSamplesProcedure
    extends FreqStoreProcedure("retract_samples") {
  override def parameters(): Array[ProcedureParameter] = Array(
    in("store", StringType), in("batch_id", LongType),
    in("sample_ids", ArrayType(LongType, containsNull = false)))
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = str(input, 0, "store")
    val batchId = input.getLong(1)
    require(!input.isNullAt(2), "retract_samples: sample_ids must not be NULL")
    val ids = input.getArray(2).toLongArray().toSeq
    require(ids.nonEmpty, "retract_samples: sample_ids must be non-empty")
    val s = spark
    import s.implicits._
    new FreqStore(s, dir)
      .retractSamples(batchId, ids.toDF("sample_id"))
    result("store" -> StringType, "generation" -> LongType,
      "samples" -> IntegerType)(
      UTF8String.fromString(dir), batchId, ids.size)
  }
  override def description(): String =
    "deactivate samples: tombstone their net observations and remove " +
      "their coverage, as the given generation"
}

/** `CALL fqs.compact(store, retain_gens => 0, split_threshold => -1)` —
  * the offline OPTIMIZE ([[FreqStore.compact]]): consolidate live
  * generations into one snapshot, optionally keeping `retain_gens`
  * superseded generations for cross-process readers and re-bucketing
  * under a doubled modulus when a bucket exceeds `split_threshold`
  * bytes (-1 = never split). */
private[sources] class CompactProcedure
    extends FreqStoreProcedure("compact") {
  override def parameters(): Array[ProcedureParameter] = Array(
    in("store", StringType),
    inDefault("retain_gens", IntegerType, "0"),
    inDefault("split_threshold", LongType, "-1"))
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = str(input, 0, "store")
    val retain = input.getInt(1)
    require(retain >= 0, s"compact: retain_gens must be >= 0, got $retain")
    val split = input.getLong(2)
    val store = new FreqStore(spark, dir)
    store.compact(splitThreshold = Some(split).filter(_ >= 0),
      retainGens = retain)
    result("store" -> StringType, "n_buckets" -> IntegerType)(
      UTF8String.fromString(dir), store.nBkts)
  }
  override def description(): String =
    "consolidate live generations into one snapshot (retention grace " +
      "and modulus-split optional)"
}

/** `CALL fqs.show_generations(store)` — time-travel DISCOVERY: one row
  * per committed generation (id, highest version, bucket modulus,
  * live), so a `VERSION AS OF` user can see which generation ids are
  * addressable — `live = false` marks generations consolidated below
  * the newest snapshot floor (possibly grace-retained on disk, but
  * unreadable by new plans). Read-only. */
private[sources] class ShowGenerationsProcedure
    extends FreqStoreProcedure("show_generations") {
  override def parameters(): Array[ProcedureParameter] =
    Array(in("store", StringType))
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = str(input, 0, "store")
    resultRows("generation" -> LongType, "version" -> IntegerType,
      "n_buckets" -> IntegerType, "live" -> BooleanType)(
      new FreqStore(spark, dir).generations.map {
        case (id, v, n, live) => Seq[Any](id, v, n, live) })
  }
  override def description(): String =
    "list committed generations (id, version, bucket modulus, live) — " +
      "the VERSION AS OF address space"
}

/** `CALL fqs.break_lock(store)` — operator judgement after a crashed
  * writer ([[FreqStore.breakLock]]). */
private[sources] class BreakLockProcedure
    extends FreqStoreProcedure("break_lock") {
  override def parameters(): Array[ProcedureParameter] =
    Array(in("store", StringType))
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = str(input, 0, "store")
    new FreqStore(spark, dir).breakLock()
    result("store" -> StringType)(UTF8String.fromString(dir))
  }
  override def description(): String =
    "remove a crashed writer's stale lock file"
}

/** The store's shared bucket function as a V2 catalog function:
  * `pmod(murmur3(position >> 11), n)` — SINGLE-argument (catalyst
  * KeyGroupedPartitioning only supports one-child transforms, which is
  * exactly why round 12 took the chromosome out of the store's hash)
  * with the modulus in the NAME (see [[FreqStoreCatalog]]). */
class PointBucketUnbound(n: Int) extends UnboundFunction {
  override def name(): String = s"point_bucket_$n"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields(0).dataType == LongType,
      s"point_bucket_$n binds (position BIGINT); got $inputType")
    new PointBucketBound(n)
  }
  override def description(): String =
    s"freqstore point-bucket: pmod(hash(position >> 11), $n)"
}

class PointBucketBound(n: Int) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(LongType)
  override def resultType(): DataType = IntegerType
  override def name(): String = s"point_bucket_$n"
  override def canonicalName(): String = s"graft.freqstore.point_bucket_$n"
  // SQL-consistent NULL handling: a direct `fqs.point_bucket_16(NULL)`
  // must not read 0 from the null slot and silently answer cell-0's
  // bucket. Store positions are non-null, so SPJ planning never hits
  // this; nullable result is the honest declaration for ad-hoc SQL use.
  override def isResultNullable: Boolean = true
  override def isDeterministic: Boolean = true
  override def produceResult(input: InternalRow): Integer =
    if (input.isNullAt(0)) null
    else FreqStore.pointBucket(input.getLong(0), n)
}
