package graft.ops

import graft.{Q, Tables}
import graft.Tables.scaledLong
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.1 scans/sources + §2.2 projection/filter/predicates.
  *
  * All plain declarative DataFrame ops: Catalyst pushes the filters and
  * projections into the parquet scan (asserted by PlanShapeSpec), which is
  * exactly the property that matters at 100 TB — scan only the columns and
  * row groups the query needs.
  */
object Scans {

  /** Scratch directory for queries that write-then-read (CSV roundtrip,
    * partition prune, VCF file, compaction): `spark.graft.scratchDir` if
    * set, else the JVM temp dir — never a hardcoded checkout path
    * (round-3 ADVICE fix: the library must work from any deployment
    * location). Scoped by applicationId: every write-then-read completes
    * within one query, so nothing is shared across apps, and two
    * concurrent apps on one host must not overwrite each other's files
    * mid-read. */
  private[graft] def scratch(s: org.apache.spark.sql.SparkSession,
      name: String, d: String): String = {
    val base = s.conf.getOption("spark.graft.scratchDir")
      .getOrElse(sys.props("java.io.tmpdir") + "/graft-scratch")
    s"$base/${s.sparkContext.applicationId}/${name}_${d.replaceAll("[^A-Za-z0-9]", "_")}"
  }

  // (l_orderkey, l_linenumber) is NOT unique in the generated lineitem, so
  // row-level outputs sort on enough columns to totally order the result
  // (hash-match discipline, SURVEY.md §0).
  private val lineitemAllCols = Seq("l_orderkey", "l_linenumber", "l_partkey",
    "l_suppkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")

  val scanParquet: Q = (s, d) =>
    Tables.lineitem(s, d)
      .orderBy(lineitemAllCols.head, lineitemAllCols.tail: _*)

  val scanProjectionPushdown: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber")

  /** Write nation to CSV and read it back with an explicit schema —
    * schema-on-text ingest, the Spark analog of the reference's VCF/BED
    * text imports (varda/tasks.py :: import_variation [U]). */
  val sourceCsvRoundtrip: Q = (s, d) => {
    val tmp = scratch(s, "csv_roundtrip", d)
    Tables.nation(s, d).write.mode("overwrite").option("header", "true").csv(tmp)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    s.read.schema(schema).option("header", "true").csv(tmp)
      .orderBy("n_nationkey")
  }

  /** ORC roundtrip — the second columnar format next to parquet: write
    * supplier as ORC, read it back. Both formats are binary columnar, so
    * every value (including the raw DOUBLE s_acctbal) survives
    * bit-exactly; the oracle reads the original parquet and the cycle is
    * hash-checked lossless. ORC ships with Spark's distribution — no
    * extra dependency — and at scale gives the same predicate-pushdown /
    * column-pruning surface as parquet (stripe-level min/max). */
  val sourceOrcRoundtrip: Q = (s, d) => {
    val tmp = scratch(s, "orc_roundtrip", d)
    Tables.supplier(s, d).write.mode("overwrite").orc(tmp)
    s.read.orc(tmp).orderBy("s_suppkey")
  }

  val sourceJsonLines: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k_val"))
      .orderBy("event_id")

  /** Hive-style partition pruning: write events partitioned by event_type,
    * read back filtering one partition value. The filter resolves to a
    * PartitionFilter at planning time (PlanShapeSpec asserts it), so the
    * scan never lists, opens, or reads the other partitions' files — at
    * 100 TB that is the difference between reading one partition and
    * reading the lake. */
  val sourcePartitionPrune: Q = (s, d) => {
    val tmp = scratch(s, "part_prune", d)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
    s.read.parquet(tmp)
      .filter(col("event_type") === "click")
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  /** Declared small-file compaction (round 3; [[Compaction]] was
    * library-only before): fragment `events` into 64 tiny parquet files —
    * the shape a streaming ingest leaves behind — then compact to ~1 MB
    * targets with one round-robin repartition and read the result back.
    * Rows must survive exactly: the oracle reads the original table, so
    * the whole fragment→compact→scan cycle is hash-checked lossless.
    * CompactionSpec additionally asserts the file-count arithmetic. */
  val sinkCompaction: Q = (s, d) => {
    val frag = scratch(s, "compact_src", d)
    val dest = scratch(s, "compact_dst", d)
    Tables.events(s, d).select("event_id", "user_id", "event_type", "value")
      .repartition(64).write.mode("overwrite").parquet(frag)
    Compaction.compactTo(s, frag, dest, 1L << 20)
      .orderBy("event_id")
  }

  /** Dynamic partition overwrite — the incremental-refresh write path of
    * a partitioned lake table: re-deliver ONE partition's data (here the
    * `click` slice, values doubled to make the rewrite observable) with
    * `partitionOverwriteMode=dynamic`, which replaces exactly the
    * partitions present in the incoming frame and leaves every other
    * partition's files untouched (PartitionOverwriteSpec pins the
    * file-level claim). This is THE daily-refresh primitive at 100 TB:
    * static overwrite mode — Spark's default — would truncate the whole
    * table root first, turning a one-partition update into a full-lake
    * rewrite. Set per-write via the writer option, never session-wide.
    * The declared output re-reads the table and digests per partition,
    * so the oracle hash-checks the post-overwrite table content. */
  val sinkPartitionOverwrite: Q = (s, d) => {
    val dir = scratch(s, "part_overwrite", d)
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
    ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    ev.filter(col("event_type") === "click")
      .withColumn("value", col("value") * 2)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_type").parquet(dir)
    s.read.parquet(dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        scaledLong(sum(Tables.dec4(col("value"))).cast(DecimalType(38, 4)), 4)
          .as("val_sum_e4"))
      .orderBy("event_type")
  }

  /** Schema evolution on read: generation 0 of an imported table lacks a
    * column that generation 1 adds — the normal life of any long-lived
    * lake table (every new pipeline field arrives mid-history). The old
    * files are NEVER rewritten: `mergeSchema` unions the footer schemas
    * at planning time and generation-0 rows surface the new column as
    * NULL. Pushdown/pruning still apply per file against each file's own
    * physical schema. */
  val sourceSchemaEvolution: Q = (s, d) => {
    val evo = scratch(s, "schema_evo", d)
    val orders = Tables.orders(s, d)
    orders.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$evo/g0")
    orders.filter(col("o_orderkey") % 2 =!= 0)
      .select("o_orderkey", "o_orderstatus", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$evo/g1")
    s.read.option("mergeSchema", "true").parquet(s"$evo/g0", s"$evo/g1")
      .orderBy("o_orderkey")
  }

  /** Schema evolution tier 2 (round 18 — the OTHER move a long-lived
    * lake table makes): TYPE WIDENING across generations. Generation 0
    * wrote a column as INT; a later writer widened it to BIGINT.
    * `mergeSchema` alone THROWS on int-vs-bigint footers — the
    * reconciliation a real lake read does is explicit per-generation
    * `schema(...)` (so the narrow footer decodes as written) + CAST to
    * the widest type + `unionByName`. Still scan-friendly: each leg is
    * a plain pruned parquet scan and the cast is codegen'd — nothing
    * driver-side. Column renames, the third classic move, are the same
    * pattern with `withColumnRenamed` per generation. */
  val sourceSchemaEvolutionWiden: Q = (s, d) => {
    val evo = scratch(s, "schema_evo_widen", d)
    val orders = Tables.orders(s, d)
    orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"),
        col("o_custkey").cast(IntegerType).as("cust"))
      .write.mode("overwrite").parquet(s"$evo/g0")
    orders.filter(col("o_orderkey") % 2 =!= 0)
      .select(col("o_orderkey"), col("o_custkey").as("cust"))
      .write.mode("overwrite").parquet(s"$evo/g1")
    val g0 = s.read.schema(StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("cust", IntegerType))))
      .parquet(s"$evo/g0")
      .withColumn("cust", col("cust").cast(LongType))
    val g1 = s.read.schema(StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("cust", LongType))))
      .parquet(s"$evo/g1")
    g0.unionByName(g1).orderBy("o_orderkey")
  }

  /** Schema evolution tier 3 (round 19 — the third classic move of a
    * long-lived lake table, after add-column and type-widening): a
    * column RENAME across generations. Generation 0 wrote the customer
    * key as `cust`; a later writer renamed it to `customer_id`. A
    * plain `mergeSchema` read silently treats that as drop+add —
    * history surfaces the new name as NULL, which is data loss in all
    * but name. The lake-format fix (Iceberg-style name mapping) is a
    * per-generation rename applied at read: each leg stays a plain
    * pruned parquet scan decoded under its own written schema, the
    * mapping is pure metadata (`withColumnRenamed` — no expression,
    * nothing row-wise), and the legs union by the POST-mapping names.
    * Same per-generation machinery as [[sourceSchemaEvolutionWiden]];
    * at 100 TB the mapping lives in table metadata and applies to any
    * number of generations without touching a written file. */
  val sourceSchemaEvolutionRename: Q = (s, d) => {
    val evo = scratch(s, "schema_evo_rename", d)
    val orders = Tables.orders(s, d)
    orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey").as("cust"))
      .write.mode("overwrite").parquet(s"$evo/g0")
    orders.filter(col("o_orderkey") % 2 =!= 0)
      .select(col("o_orderkey"), col("o_custkey").as("customer_id"))
      .write.mode("overwrite").parquet(s"$evo/g1")
    val g0 = s.read.parquet(s"$evo/g0")
      .withColumnRenamed("cust", "customer_id")
    val g1 = s.read.parquet(s"$evo/g1")
    g0.unionByName(g1).orderBy("o_orderkey")
  }

  val projectRenameCast: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey").as("okey"),
        col("l_linenumber").as("line_no"),
        scaledLong((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4)), 4).as("net_price_e4"),
        col("l_quantity").cast(LongType).as("qty_int"))
      .orderBy("okey", "line_no", "net_price_e4", "qty_int")

  val filterConjunct: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter((col("l_returnflag") === "R" && col("l_quantity").between(10, 20))
        || (col("l_linestatus") === "F" && col("l_quantity") > 45))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity")

  val filterInLike: Q = (s, d) =>
    Tables.part(s, d)
      .filter(col("p_type").like("%ECO%") || col("p_size").isin(1, 5, 9))
      .select("p_partkey", "p_name", "p_type", "p_size")
      .orderBy("p_partkey")

  val filterNull3vl: Q = (s, d) =>
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"),
        nullif(col("c_mktsegment"), lit("BUILDING")).isNull.as("is_building"),
        (nullif(col("c_mktsegment"), lit("BUILDING")) <=>
          nullif(col("c_mktsegment"), lit("AUTOMOBILE"))).as("nsafe_eq"))
      .orderBy("c_custkey")

  /** Scalar subquery in a filter: orders priced above the global average.
    * Through the SQL entry path on purpose — Catalyst turns both scalar
    * subqueries into one-row broadcast joins. The comparison is integer
    * cross-multiplication (`price_e4 · n > Σ price_e4`), not a division,
    * so no engine-specific rounding can flip a boundary row. */
  val subqueryScalar: Q = (s, d) => {
    Tables.registerViews(s, d)
    s.sql(oracle("subquery_scalar"))
  }

  /** Correlated scalar subqueries: orders priced above THEIR customer's
    * average. Catalyst decorrelates both aggregating subqueries into
    * grouped joins (RewriteCorrelatedScalarSubquery, SURVEY.md §4) — the
    * plan is joins + hash aggregates, never a per-row re-scan. */
  val subqueryCorrelated: Q = (s, d) => {
    Tables.registerViews(s, d)
    s.sql(oracle("subquery_correlated"))
  }

  val queries: Map[String, Q] = Map(
    "scan_parquet" -> scanParquet,
    "subquery_scalar" -> subqueryScalar,
    "subquery_correlated" -> subqueryCorrelated,
    "scan_projection_pushdown" -> scanProjectionPushdown,
    "source_csv_roundtrip" -> sourceCsvRoundtrip,
    "source_orc_roundtrip" -> sourceOrcRoundtrip,
    "source_json_lines" -> sourceJsonLines,
    "source_partition_prune" -> sourcePartitionPrune,
    "source_schema_evolution" -> sourceSchemaEvolution,
    "source_schema_evolution_widen" -> sourceSchemaEvolutionWiden,
    "source_schema_evolution_rename" -> sourceSchemaEvolutionRename,
    "sink_compaction" -> sinkCompaction,
    "sink_partition_overwrite" -> sinkPartitionOverwrite,
    "project_rename_cast" -> projectRenameCast,
    "filter_conjunct" -> filterConjunct,
    "filter_in_like" -> filterInLike,
    "filter_null_3vl" -> filterNull3vl)

  val oracle: Map[String, String] = Map(
    "subquery_scalar" ->
      """SELECT o_orderkey FROM orders
         WHERE CAST(floor(o_totalprice * 10000) AS BIGINT)
               * (SELECT count(*) FROM orders)
               > (SELECT SUM(CAST(floor(o_totalprice * 10000) AS BIGINT)) FROM orders)
         ORDER BY o_orderkey""",
    "subquery_correlated" ->
      """SELECT o.o_orderkey FROM orders o
         WHERE CAST(floor(o.o_totalprice * 10000) AS BIGINT)
               * (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
               > (SELECT SUM(CAST(floor(o2.o_totalprice * 10000) AS BIGINT))
                  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
         ORDER BY o.o_orderkey""",
    "scan_parquet" ->
      """SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey,
         l_suppkey, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate""",
    "scan_projection_pushdown" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "source_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "source_orc_roundtrip" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier ORDER BY s_suppkey",
    "source_json_lines" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val FROM events ORDER BY event_id",
    "source_partition_prune" ->
      """SELECT event_id, user_id, event_type, value
         FROM events WHERE event_type = 'click' ORDER BY event_id""",
    "sink_compaction" ->
      """SELECT event_id, user_id, event_type, value
         FROM events ORDER BY event_id""",
    "sink_partition_overwrite" ->
      """WITH ev AS (SELECT event_type,
                       CASE WHEN event_type = 'click' THEN value * 2
                            ELSE value END AS value
                     FROM events)
         SELECT event_type, count(*) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4))
                * 10000 AS BIGINT) AS val_sum_e4
         FROM ev GROUP BY 1 ORDER BY 1""",
    "source_schema_evolution" ->
      """SELECT o_orderkey, o_orderstatus,
                CAST(NULL AS VARCHAR) AS o_orderpriority
         FROM orders WHERE o_orderkey % 2 = 0
         UNION ALL
         SELECT o_orderkey, o_orderstatus, o_orderpriority
         FROM orders WHERE o_orderkey % 2 <> 0
         ORDER BY o_orderkey""",
    "source_schema_evolution_widen" ->
      """SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS cust
         FROM orders WHERE o_orderkey % 2 = 0
         UNION ALL
         SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS cust
         FROM orders WHERE o_orderkey % 2 <> 0
         ORDER BY o_orderkey""",
    "source_schema_evolution_rename" ->
      """SELECT o_orderkey, o_custkey AS customer_id
         FROM orders WHERE o_orderkey % 2 = 0
         UNION ALL
         SELECT o_orderkey, o_custkey AS customer_id
         FROM orders WHERE o_orderkey % 2 <> 0
         ORDER BY o_orderkey""",
    "project_rename_cast" ->
      """SELECT l_orderkey AS okey, l_linenumber AS line_no,
         CAST(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS net_price_e4,
         CAST(l_quantity AS BIGINT) AS qty_int
         FROM lineitem ORDER BY okey, line_no, net_price_e4, qty_int""",
    "filter_conjunct" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity
         FROM lineitem
         WHERE (l_returnflag = 'R' AND l_quantity BETWEEN 10 AND 20)
            OR (l_linestatus = 'F' AND l_quantity > 45)
         ORDER BY l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity""",
    "filter_in_like" ->
      """SELECT p_partkey, p_name, p_type, p_size FROM part
         WHERE p_type LIKE '%ECO%' OR p_size IN (1, 5, 9)
         ORDER BY p_partkey""",
    "filter_null_3vl" ->
      """SELECT c_custkey,
         NULLIF(c_mktsegment, 'BUILDING') AS seg,
         NULLIF(c_mktsegment, 'BUILDING') IS NULL AS is_building,
         NULLIF(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULLIF(c_mktsegment, 'AUTOMOBILE') AS nsafe_eq
         FROM customer ORDER BY c_custkey""")
}
