package graft.ops

import graft.{Q, Tables}
import graft.Tables.dec4
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.3 joins.
  *
  * Scale notes: equi-joins shuffle both sides on the key unless one side is
  * broadcast — `join_broadcast` pins the broadcast plan for dimension
  * tables (the right call at 100 TB: ship the 10-row dim, not the fact
  * table), `join_sort_merge` pins SMJ (the right call for large-large).
  * The as-of join is the union+running-window formulation: one shuffle on
  * the key, no per-row point lookups, which is how a temporal join stays
  * linear at cluster scale.
  */
object Joins {

  val joinInnerEqui: Q = (s, d) => {
    val o = Tables.orders(s, d); val c = Tables.customer(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .select(o("o_orderkey"), o("o_custkey"), c("c_name"), o("o_totalprice"))
      .orderBy("o_orderkey")
  }

  val joinBroadcast: Q = (s, d) => {
    val li = Tables.lineitem(s, d); val sup = Tables.supplier(s, d)
    li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .select(li("l_orderkey"), li("l_linenumber"), sup("s_name"))
      .orderBy("l_orderkey", "l_linenumber", "s_name")
  }

  val joinSortMerge: Q = (s, d) => {
    val o = Tables.orders(s, d); val c = Tables.customer(s, d)
    o.join(c.hint("merge"), o("o_custkey") === c("c_custkey"))
      .select(o("o_orderkey"), c("c_name"), c("c_nationkey"))
      .orderBy("o_orderkey")
  }

  val joinLeftOuter: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
    c.join(big, c("c_custkey") === big("o_custkey"), "left")
      .groupBy(c("c_custkey"), c("c_name"))
      .agg(count(big("o_orderkey")).as("n_big_orders"))
      .orderBy("c_custkey")
  }

  val joinFullOuter: Q = (s, d) => {
    val a = Tables.orders(s, d).filter(col("o_custkey") % 2 === 0)
      .select(col("o_custkey").as("k_orders")).distinct()
    val b = Tables.customer(s, d).filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("k_customer"))
    a.join(b, a("k_orders") === b("k_customer"), "full")
      .orderBy(coalesce(col("k_orders"), col("k_customer")))
  }

  val joinLeftSemi: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  val joinLeftAnti: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  val joinTheta: Q = (s, d) => {
    val sup = Tables.supplier(s, d); val c = Tables.customer(s, d)
    sup.join(c, sup("s_nationkey") === c("c_nationkey")
        && sup("s_acctbal") > c("c_acctbal"))
      .select(sup("s_suppkey"), c("c_custkey"))
      .orderBy("s_suppkey", "c_custkey")
  }

  /** As-of join without a native Spark operator: tag both streams, union,
    * and take the running `last` event id over (key, time) order. One
    * shuffle, no quadratic work — the standard scalable formulation.
    * DuckDB oracle uses its native ASOF LEFT JOIN (`<=` bound). Events are
    * pre-deduped to one row per (user, ts) with max event_id so the
    * at-or-before tie is deterministic on both engines. */
  val joinAsof: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .groupBy("user_id", "ts").agg(max("event_id").as("event_id"))
    val ord = Tables.orders(s, d).select(
      col("o_orderkey"),
      (col("o_custkey") % 97).as("uk"),
      expr("timestamp_ntz '2024-01-01 00:00:00' + make_dt_interval(0, 0, cast(o_orderkey % 43200 as int), 0)").as("asof_ts"))
    val evU = ev.select(col("user_id").as("k"), col("ts").as("t"),
      lit(0).as("is_order"), col("event_id"),
      lit(null).cast(LongType).as("o_orderkey"))
    val ordU = ord.select(col("uk").as("k"), col("asof_ts").as("t"),
      lit(1).as("is_order"), lit(null).cast(LongType).as("event_id"),
      col("o_orderkey"))
    val w = Window.partitionBy("k")
      .orderBy(col("t"), col("is_order"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    evU.unionByName(ordU)
      .withColumn("matched_event_id", last(col("event_id"), ignoreNulls = true).over(w))
      .filter(col("is_order") === 1)
      .select(col("o_orderkey"), col("matched_event_id"))
      .orderBy("o_orderkey")
  }

  /** Forward as-of join with tolerance — the other half of the as-of
    * family (pandas `merge_asof(direction='forward', tolerance=…)`,
    * kdb's `wj`): each order matches the EARLIEST event at-or-after its
    * timestamp, but only within a 1-hour window — beyond tolerance the
    * match is null, which is the semantics feature-stores need ("the
    * next reading, unless the sensor went quiet"). Same scalable
    * union + running-window formulation as [[joinAsof]], mirrored: scan
    * DESCENDING in time so "running last non-null" means "nearest
    * future event", carry the event's (ts, id) as ONE struct so the
    * tolerance test happens after the window without a second join.
    * Still one shuffle on the key; tolerance is a post-window filter,
    * never a range-join blow-up. DuckDB's ASOF is backward-only, so the
    * oracle is the naive bounded range join + min + join-back. */
  val joinAsofFwd: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .groupBy("user_id", "ts").agg(max("event_id").as("event_id"))
    val ord = Tables.orders(s, d).select(
      col("o_orderkey"),
      (col("o_custkey") % 97).as("uk"),
      expr("timestamp_ntz '2024-01-01 00:00:00' + make_dt_interval(0, 0, cast(o_orderkey % 43200 as int), 0)").as("asof_ts"))
    val evU = ev.select(col("user_id").as("k"), col("ts").as("t"),
      lit(0).as("is_order"),
      struct(col("ts").as("et"), col("event_id").as("eid")).as("ev_s"),
      lit(null).cast(LongType).as("o_orderkey"))
    val ordU = ord.select(col("uk").as("k"), col("asof_ts").as("t"),
      lit(1).as("is_order"),
      lit(null).cast("struct<et:timestamp_ntz,eid:bigint>").as("ev_s"),
      col("o_orderkey"))
    // DESC time scan: frame = all rows at-or-after t; events sort before
    // orders at equal t (is_order asc) so an exactly-at-t event matches
    val w = Window.partitionBy("k")
      .orderBy(col("t").desc, col("is_order"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    evU.unionByName(ordU)
      .withColumn("m", last(col("ev_s"), ignoreNulls = true).over(w))
      .filter(col("is_order") === 1)
      .select(col("o_orderkey"),
        when(col("m.et") <= expr("t + interval 1 hour"), col("m.eid"))
          .as("matched_event_id"))
      .orderBy("o_orderkey")
  }

  /** Salted equi-join — the explicit skew escape hatch ([[Skew]]): the
    * fact side's key is salted 8 ways by a row-derived hash and the dim
    * side is replicated across the salt shards, so one hot supplier key
    * spreads over 8 reducers instead of stalling one. Result is
    * row-identical to the plain join (SkewSpec proves equality); the
    * declared output is the same rows as `join_broadcast`'s shape. */
  val joinSkewSalted: Q = (s, d) => {
    val small = Tables.supplier(s, d)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    Skew.saltedJoin(Tables.lineitem(s, d), small, "l_suppkey",
        salts = 8, saltBy = col("l_orderkey") * lit(31) + col("l_linenumber"))
      .select("l_orderkey", "l_linenumber", "l_suppkey", "s_name")
      .orderBy("l_orderkey", "l_linenumber", "l_suppkey", "s_name")
  }

  /** Fingerprint of the source parquet dir (relative file paths, lengths,
    * mtimes — recursive, so partitioned/nested sources contribute their
    * leaf files too) plus the expected schema — stamped into the reuse
    * marker so a regenerated or re-schemaed source invalidates the cached
    * layout instead of silently serving stale rows. File paths are
    * relativized against the fs-QUALIFIED source URI (round-7 ADVICE fix:
    * a raw string-prefix strip against the unqualified path silently
    * yields absolute paths — and so a spurious cold rewrite — when the
    * caller's path spelling differs from the filesystem's, e.g. relative
    * vs absolute or scheme-qualified). */
  private def sourceFingerprint(s: org.apache.spark.sql.SparkSession,
      srcPath: String, df: DataFrame): String = {
    val p = new org.apache.hadoop.fs.Path(srcPath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val base = fs.makeQualified(p).toUri
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      val rel = base.relativize(f.getPath.toUri).toString
      files += s"$rel:${f.getLen}:${f.getModificationTime}"
    }
    s"${files.sorted.mkString(",")}|${df.schema.toDDL}"
  }

  /** Memoized fingerprint per (live session, source path) — the
    * recursive listing is the warm path's only non-constant cost. The
    * memo is REVALIDATED against the source dir's own modification time
    * (one `getFileStatus`, O(1)) so a source regenerated mid-session
    * still invalidates the cached layout — an overwrite rewrite
    * recreates the directory, bumping its mtime. Granularity limit: a
    * leaf file replaced in-place deep inside a partitioned dir without
    * touching the root dir escapes the cheap check until the next
    * session (the cross-JVM marker compare re-fingerprints fully). */
  private val fpCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), (Long, String)]
  private def sourceFingerprintCached(s: org.apache.spark.sql.SparkSession,
      srcPath: String, df: DataFrame): String = {
    val p = new org.apache.hadoop.fs.Path(srcPath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val dirM = fs.getFileStatus(p).getModificationTime
    fpCache.get((s, srcPath)) match {
      case Some((m, fp)) if m == dirM => fp
      case _ =>
        fpCache.filterInPlace { case ((sess, _), _) =>
          !sess.sparkContext.isStopped }
        val fp = sourceFingerprint(s, srcPath, df)
        fpCache.put((s, srcPath), (dirM, fp))
        fp
    }
  }

  /** Ensure a bucketed+sorted copy of `df` (read from `srcPath`) exists
    * as table `name`. The bucketed write is the one-time layout cost the
    * operator exists to amortize, so it runs at most once per source
    * state: a marker file carrying the source fingerprint is written
    * after the bucketed write commits, making the layout reusable across
    * JVMs — a fresh session (whose in-memory catalog forgot the table)
    * re-registers an external bucketed table over the surviving files
    * instead of re-paying the write. A missing OR stale marker (first
    * run, died mid-write, source regenerated, schema changed) takes the
    * cold path: clear and rewrite. */
  private def ensureBucketed(s: org.apache.spark.sql.SparkSession,
      name: String, key: String, srcPath: String, df: DataFrame): Unit = {
    val wh = new org.apache.hadoop.fs.Path(
      new java.net.URI(s.conf.get("spark.sql.warehouse.dir")))
    val loc = new org.apache.hadoop.fs.Path(wh, name.toLowerCase)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(loc, "_GRAFT_BUCKETS_OK")
    val fp = sourceFingerprintCached(s, srcPath, df)
    val markerValid = fs.exists(marker) && {
      val in = fs.open(marker)
      try {
        val b = new Array[Byte](fs.getFileStatus(marker).getLen.toInt)
        in.readFully(b)
        new String(b, java.nio.charset.StandardCharsets.UTF_8) == fp
      } finally in.close()
    }
    if (s.catalog.tableExists(name)) {
      // the in-session catalog entry is only trustworthy while the marker
      // still matches the source — a source regenerated mid-session must
      // drop the stale layout, not serve it (same staleness the marker
      // guards against across JVMs)
      if (markerValid) return
      s.sql(s"DROP TABLE IF EXISTS $name")
    }
    if (markerValid) {
      // underscore-prefixed marker is invisible to the parquet file lister
      s.sql(s"""CREATE TABLE $name (${df.schema.toDDL})
                USING parquet
                CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS
                LOCATION '${loc.toString}'""")
    } else {
      fs.delete(loc, true)
      df.write.mode("overwrite").bucketBy(8, key).sortBy(key).saveAsTable(name)
      val out = fs.create(marker)
      try out.write(fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Bucketed co-located join — the 100 TB large-large join layout: both
    * sides written bucketed+sorted on the join key, so the sort-merge join
    * at read time needs NO exchange (BucketingSpec and PlanShapeSpec
    * assert zero Exchange operators). At scale the bucketed write is the
    * one-time cost that every subsequent join on that key amortizes —
    * [[ensureBucketed]] pays it once per sfDir and reuses the layout on
    * every later call, including from a fresh JVM. The merge hint pins SMJ
    * without touching session conf (a broadcast would also be shuffle-free
    * but misses the point). */
  val joinBucketColocated: Q = (s, d) => {
    val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
    ensureBucketed(s, s"b_orders_$sfx", "o_custkey",
      s"$d/orders.parquet", Tables.orders(s, d))
    ensureBucketed(s, s"b_customer_$sfx", "c_custkey",
      s"$d/customer.parquet", Tables.customer(s, d))
    val bo = s.table(s"b_orders_$sfx"); val bc = s.table(s"b_customer_$sfx")
    bo.join(bc.hint("merge"), bo("o_custkey") === bc("c_custkey"))
      .select(bo("o_orderkey"), bo("o_custkey"), bc("c_name"))
      .orderBy("o_orderkey")
  }

  /** Batch MERGE/upsert — incremental maintenance without a table format:
    * base ⟗ updates on the key, updates win, unmatched updates insert,
    * everything else is kept; each row tagged with its action. One
    * key-partitioned full-outer shuffle — the MERGE shape at any scale
    * (a real deployment wraps the same plan in a transactional table
    * format's commit). Updates fixture: every 7th order re-priced, plus
    * one brand-new key. This is the batch analog of the reference folding
    * re-imports into existing state (varda/tasks.py [U]). */
  val mergeUpsert: Q = (s, d) => {
    val e4 = expr("cast(floor(o_totalprice * 10000) as bigint)")
    val o = Tables.orders(s, d)
    val base = o.select(col("o_orderkey"), col("o_custkey"), e4.as("price_e4"))
    val upd = o.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), col("o_custkey"), (e4 + 7).as("price_e4"))
      .unionByName(o.agg(max("o_orderkey").as("mk"))
        .select((col("mk") + 1).as("o_orderkey"),
          lit(1L).as("o_custkey"), lit(999L).as("price_e4")))
    base.as("b").join(upd.as("u"),
        col("b.o_orderkey") === col("u.o_orderkey"), "full")
      .select(
        coalesce(col("b.o_orderkey"), col("u.o_orderkey")).as("o_orderkey"),
        coalesce(col("u.o_custkey"), col("b.o_custkey")).as("o_custkey"),
        coalesce(col("u.price_e4"), col("b.price_e4")).as("price_e4"),
        when(col("u.o_orderkey").isNull, "kept")
          .when(col("b.o_orderkey").isNull, "inserted")
          .otherwise("updated").as("action"))
      .orderBy("o_orderkey")
  }

  /** CDC changelog application — the MERGE shape [[mergeUpsert]] lacks:
    * DELETES and op ORDERING. A changelog of (key, seq, op I/U/D,
    * payload) rows collapses to the last op per key (max_by on seq —
    * one map-side-combining aggregate, never a sort of the log), then
    * one key-partitioned full-outer merge applies it: D drops, U
    * overrides, I inserts, absent keeps. Deterministic fixture: every
    * key≡2 (mod 3) inserts, key≡0 (mod 3) updates, and keys ≡1/≡3
    * (mod 6) delete — keys ≡3 (mod 6) carry BOTH a seq-1 update and a
    * seq-2 delete, pinning last-op-wins. */
  val mergeCdcApply: Q = (s, d) => {
    val o = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      col("o_orderstatus").as("status"),
      expr("cast(floor(o_totalprice * 10000) as bigint)").as("price_e4"))
    val store = o.filter(col("k") % 3 =!= 2)
    val log = o.filter(col("k") % 3 === 2)
        .select(col("k"), lit(1L).as("seq"), lit("I").as("op"),
          col("status"), col("price_e4"))
      .unionByName(o.filter(col("k") % 3 === 0)
        .select(col("k"), lit(1L).as("seq"), lit("U").as("op"),
          lit("UPD").as("status"), (col("price_e4") + 1L).as("price_e4")))
      .unionByName(o.filter(col("k") % 6 === 1 || col("k") % 6 === 3)
        .select(col("k"), lit(2L).as("seq"), lit("D").as("op"),
          lit(null).cast("string").as("status"),
          lit(null).cast("long").as("price_e4")))
    applyCdc(store, log).orderBy("o_orderkey")
  }

  /** The CDC apply step as a library surface (shared by the declared key
    * and the streaming form's parity test): collapse the changelog to
    * the last op per key, then merge into the store. Schema contract:
    * store (k, status, price_e4), log (k, seq, op, status, price_e4). */
  private[graft] def applyCdc(store: DataFrame, log: DataFrame): DataFrame = {
    val last = log.groupBy("k")
      .agg(max_by(struct(col("op"), col("status"), col("price_e4")),
        col("seq")).as("f"))
      .select(col("k"), col("f.op").as("op"),
        col("f.status").as("n_status"), col("f.price_e4").as("n_price"))
    store.join(last, Seq("k"), "full")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("k").as("o_orderkey"),
        coalesce(col("n_status"), col("status")).as("status"),
        coalesce(col("n_price"), col("price_e4")).as("price_e4"))
  }

  val joinCross: Q = (s, d) => {
    val r = Tables.region(s, d); val n = Tables.nation(s, d)
    r.crossJoin(n)
      .select(r("r_regionkey"), n("n_nationkey"), r("r_name"), n("n_name"))
      .orderBy("r_regionkey", "n_nationkey")
  }

  /** NULL-SAFE equi-join (`<=>` / SQL `IS NOT DISTINCT FROM`): NULL keys
    * MATCH each other instead of silently dropping — the semantics a
    * dimension attach needs when the key is optional (here: market
    * segment with one segment nulled out, each row annotated with its
    * segment's population INCLUDING the null segment). EqualNullSafe is
    * still an equi-join key to the planner, so this broadcasts and
    * hash-joins exactly like `join_broadcast` — no BNLJ fallback. */
  val joinNullSafe: Q = (s, d) => {
    val c = Tables.customer(s, d).select(col("c_custkey"),
      when(col("c_mktsegment") === "BUILDING", lit(null))
        .otherwise(col("c_mktsegment")).as("seg_n"))
    val g = c.groupBy("seg_n").agg(count(lit(1)).as("seg_count"))
      .withColumnRenamed("seg_n", "seg_g")
    c.join(broadcast(g), col("seg_n") <=> col("seg_g"))
      .select(col("c_custkey"), col("seg_n"), col("seg_count"))
      .orderBy("c_custkey")
  }

  val queries: Map[String, Q] = Map(
    "join_null_safe" -> joinNullSafe,
    "join_inner_equi" -> joinInnerEqui,
    "join_broadcast" -> joinBroadcast,
    "join_sort_merge" -> joinSortMerge,
    "join_left_outer" -> joinLeftOuter,
    "join_full_outer" -> joinFullOuter,
    "join_left_semi" -> joinLeftSemi,
    "join_left_anti" -> joinLeftAnti,
    "join_theta" -> joinTheta,
    "join_asof" -> joinAsof,
    "join_asof_fwd" -> joinAsofFwd,
    "join_skew_salted" -> joinSkewSalted,
    "join_bucket_colocated" -> joinBucketColocated,
    "merge_upsert" -> mergeUpsert,
    "merge_cdc_apply" -> mergeCdcApply,
    "join_cross" -> joinCross)

  val oracle: Map[String, String] = Map(
    "join_null_safe" ->
      """WITH c AS (SELECT c_custkey,
                           nullif(c_mktsegment, 'BUILDING') AS seg_n
                    FROM customer),
              g AS (SELECT seg_n, count(*) AS seg_count
                    FROM c GROUP BY seg_n)
         SELECT c.c_custkey, c.seg_n, g.seg_count
         FROM c JOIN g ON c.seg_n IS NOT DISTINCT FROM g.seg_n
         ORDER BY c_custkey""",
    "join_inner_equi" ->
      """SELECT o_orderkey, o_custkey, c_name, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, s_name
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         ORDER BY l_orderkey, l_linenumber, s_name""",
    "join_sort_merge" ->
      """SELECT o_orderkey, c_name, c_nationkey
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "join_left_outer" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_big_orders
         FROM customer LEFT JOIN orders
           ON c_custkey = o_custkey AND o_totalprice > 450000
         GROUP BY c_custkey, c_name ORDER BY c_custkey""",
    "join_full_outer" ->
      """SELECT a.k_orders, b.k_customer FROM
         (SELECT DISTINCT o_custkey AS k_orders FROM orders WHERE o_custkey % 2 = 0) a
         FULL JOIN (SELECT c_custkey AS k_customer FROM customer WHERE c_custkey % 3 = 0) b
           ON a.k_orders = b.k_customer
         ORDER BY COALESCE(a.k_orders, b.k_customer)""",
    "join_left_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 450000)
         ORDER BY c_custkey""",
    "join_left_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 450000)
         ORDER BY c_custkey""",
    "join_theta" ->
      """SELECT s_suppkey, c_custkey
         FROM supplier JOIN customer
           ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
         ORDER BY s_suppkey, c_custkey""",
    "join_asof" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                            max(event_id) AS event_id
                     FROM events GROUP BY 1, 2),
            ord AS (SELECT o_orderkey, o_custkey % 97 AS uk,
                           TIMESTAMP '2024-01-01 00:00:00'
                             + (o_orderkey % 43200) * INTERVAL 1 MINUTE AS asof_ts
                    FROM orders)
         SELECT o.o_orderkey, e.event_id AS matched_event_id
         FROM ord o ASOF LEFT JOIN ev e
           ON o.uk = e.user_id AND e.ts <= o.asof_ts
         ORDER BY o.o_orderkey""",
    "join_asof_fwd" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                            max(event_id) AS event_id
                     FROM events GROUP BY 1, 2),
            ord AS (SELECT o_orderkey, o_custkey % 97 AS uk,
                           TIMESTAMP '2024-01-01 00:00:00'
                             + (o_orderkey % 43200) * INTERVAL 1 MINUTE AS asof_ts
                    FROM orders),
            m AS (SELECT o.o_orderkey, o.uk, min(e.ts) AS mt
                  FROM ord o LEFT JOIN ev e
                    ON e.user_id = o.uk AND e.ts >= o.asof_ts
                   AND e.ts <= o.asof_ts + INTERVAL 1 HOUR
                  GROUP BY 1, 2)
         SELECT m.o_orderkey, e2.event_id AS matched_event_id
         FROM m LEFT JOIN ev e2
           ON e2.user_id = m.uk AND e2.ts = m.mt
         ORDER BY m.o_orderkey""",
    "join_skew_salted" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, s_name
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         ORDER BY l_orderkey, l_linenumber, l_suppkey, s_name""",
    "join_bucket_colocated" ->
      """SELECT o_orderkey, o_custkey, c_name
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "merge_upsert" ->
      """WITH upd AS (SELECT o_orderkey, o_custkey,
                        CAST(floor(o_totalprice * 10000) AS BIGINT) + 7 AS price_e4
                      FROM orders WHERE o_orderkey % 7 = 0
                      UNION ALL
                      SELECT max(o_orderkey) + 1, 1, CAST(999 AS BIGINT) FROM orders),
            base AS (SELECT o_orderkey, o_custkey,
                       CAST(floor(o_totalprice * 10000) AS BIGINT) AS price_e4
                     FROM orders)
         SELECT COALESCE(b.o_orderkey, u.o_orderkey) AS o_orderkey,
                COALESCE(u.o_custkey, b.o_custkey) AS o_custkey,
                COALESCE(u.price_e4, b.price_e4) AS price_e4,
                CASE WHEN u.o_orderkey IS NULL THEN 'kept'
                     WHEN b.o_orderkey IS NULL THEN 'inserted'
                     ELSE 'updated' END AS action
         FROM base b FULL JOIN upd u ON b.o_orderkey = u.o_orderkey
         ORDER BY o_orderkey""",
    "merge_cdc_apply" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS status,
                      CAST(floor(o_totalprice * 10000) AS BIGINT) AS price_e4
                    FROM orders),
            store AS (SELECT * FROM o WHERE k % 3 <> 2),
            log AS (
              SELECT k, 1 AS seq, 'I' AS op, status, price_e4
              FROM o WHERE k % 3 = 2
              UNION ALL
              SELECT k, 1, 'U', 'UPD', price_e4 + 1 FROM o WHERE k % 3 = 0
              UNION ALL
              SELECT k, 2, 'D', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
              FROM o WHERE k % 6 = 1 OR k % 6 = 3),
            last AS (SELECT k, op, status AS n_status, price_e4 AS n_price
                     FROM log
                     QUALIFY row_number() OVER (PARTITION BY k
                               ORDER BY seq DESC) = 1)
         SELECT k AS o_orderkey,
                COALESCE(n_status, status) AS status,
                COALESCE(n_price, price_e4) AS price_e4
         FROM store FULL JOIN last USING (k)
         WHERE op IS NULL OR op <> 'D'
         ORDER BY o_orderkey""",
    "join_cross" ->
      """SELECT r_regionkey, n_nationkey, r_name, n_name
         FROM region CROSS JOIN nation
         ORDER BY r_regionkey, n_nationkey""")
}
