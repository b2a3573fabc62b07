package graft.sources

import java.util

import graft.varda.FreqStore
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

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
  * Read-only: writes go through [[FreqStore.commit]]'s transactional
  * path, never SQL inserts — create/alter/drop are rejected. */
class FreqStoreCatalog extends TableCatalog with FunctionCatalog {
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
    val dir = ident.name()
    requireStoreDir(dir)
    new FreqStoreTable(dir, catalogPartitioned = true)
  }

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
    val asOf = version.toLongOption.getOrElse(sys.error(
      s"freqstore: VERSION AS OF takes a generation id, got '$version'"))
    requireStoreDir(ident.name())
    new FreqStoreTable(ident.name(), catalogPartitioned = true,
      asOfFixed = Some(asOf))
  }
  override def tableExists(ident: Identifier): Boolean =
    try { loadTable(ident); true } catch { case _: Exception => false }
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
}

object FreqStoreCatalog {
  private val BucketFn = "point_bucket_(\\d+)".r
  private[sources] def parseBucketFn(name: String): Option[UnboundFunction] =
    name match {
      case BucketFn(n) => Some(new PointBucketUnbound(n.toInt))
      case _ => None
    }
  private[sources] def transformFor(n: Int): Transform =
    Expressions.apply(s"point_bucket_$n", Expressions.column("position"))
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
  override def isResultNullable: Boolean = false
  override def isDeterministic: Boolean = true
  override def produceResult(input: InternalRow): Integer =
    FreqStore.pointBucket(input.getLong(0), n)
}
