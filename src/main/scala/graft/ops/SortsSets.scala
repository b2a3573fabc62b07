package graft.ops

import graft.{Q, Tables}
import graft.Tables.dec4
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** §2.6 sorts/limits/top-k + §2.7 set operations.
  *
  * Top-k compiles to TakeOrderedAndProject (per-partition heaps + a single
  * driver merge — no full sort, no full shuffle), which is the only top-k
  * that works at 100 TB. Per-group top-k is the row_number window filter:
  * one shuffle on the group key.
  */
object SortsSets {

  val sortMultiNull: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        nullif(col("o_orderpriority"), lit("1-URGENT")).as("prio"),
        col("o_orderstatus"))
      .orderBy(col("prio").asc_nulls_first, col("o_orderstatus").desc,
        col("o_orderkey"))

  val limitOffset: Q = (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey")
      .orderBy("o_orderkey")
      .offset(20).limit(20)

  val topkGlobal: Q = (s, d) =>
    Tables.orders(s, d)
      .orderBy(dec4(col("o_totalprice")).desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_totalprice")

  val topkPerGroup: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(dec4(col("o_totalprice")).desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Content-hash-derived pseudo-random order, identical on every engine
    * and every run — the portable substitute for rand(seed), whose stream
    * is engine-specific. */
  private val docHash =
    expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)")

  /** Deterministic stratified sampling: the 5 pseudo-randomly-first
    * documents per language. Eval-set construction at corpus scale —
    * hash order is stable under reruns, engine changes, and data
    * repartitioning, unlike rand()-based sampling. */
  val sampleStratified: Q = (s, d) => {
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("h", docHash)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("lang", "rn", "doc_id")
      .orderBy("lang", "rn")
  }

  /** Deterministic train/val/test split by content hash (80/10/10):
    * membership is a pure function of the document id, so the split
    * reproduces anywhere and new documents never reshuffle old ones —
    * the property leakage-safe dataset splits require. */
  val sampleSplit: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("bucket", docHash % 10)
      .select(col("doc_id"),
        when(col("bucket") < 8, "train")
          .when(col("bucket") === 8, "val")
          .otherwise("test").as("split"))
      .orderBy("doc_id")

  /** Bottom-k uniform sample: the 100 documents with the smallest
    * content hash — the distributed-safe "give me a random sample of the
    * corpus" primitive. Bottom-k by a uniform hash IS a uniform sample
    * (every doc equally likely to land in the k smallest), but unlike
    * reservoir sampling it needs no sequential pass and no driver state:
    * `orderBy(h).limit(k)` plans as TakeOrderedAndProject, each partition
    * ships only its own top-k candidates, O(k) rows reach the driver
    * regardless of corpus size. Hash keyed on (text, doc_id) so the
    * sample is rerun- and engine-stable. */
  val sampleBottomK: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(concat(col("text"), lit("|"),
          col("doc_id").cast(StringType))).as("hk"))
      .orderBy("hk")
      .limit(100)

  val setUnionAll: Q = (s, d) =>
    Tables.orders(s, d).select(col("o_custkey").as("k"))
      .unionAll(Tables.customer(s, d).select(col("c_custkey").as("k")))
      .orderBy("k")

  val setUnionDistinct: Q = (s, d) =>
    Tables.orders(s, d).select(col("o_custkey").as("k"))
      .union(Tables.customer(s, d).select(col("c_custkey").as("k")))
      .distinct()
      .orderBy("k")

  val setIntersect: Q = (s, d) =>
    Tables.customer(s, d).select(col("c_nationkey").as("k"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("k")))
      .orderBy("k")

  // bag-semantics inputs with real multiplicities: custkeys of two
  // overlapping order subsets (a customer appears once per qualifying
  // order)
  private def bagA(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d).filter(col("o_orderkey") % 2 === 0)
      .select(col("o_custkey").as("k"))
  private def bagB(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d).filter(col("o_orderkey") % 3 === 0)
      .select(col("o_custkey").as("k"))

  /** INTERSECT ALL: each key kept min(multiplicity in A, in B) times. */
  val setIntersectAll: Q = (s, d) =>
    bagA(s, d).intersectAll(bagB(s, d)).orderBy("k")

  /** EXCEPT ALL: multiplicities subtract instead of vanishing. */
  val setExceptAll: Q = (s, d) =>
    bagA(s, d).exceptAll(bagB(s, d)).orderBy("k")

  /** EXCEPT with a PROVABLY NON-EMPTY difference (round-11: the old
    * customer-minus-all-suppliers form returned 0 rows on both engines
    * at every sf — a vacuous pass certifying nothing). The supplier
    * side is restricted to ONE region's nations, so every customer
    * nationkey outside that region survives the difference. */
  val setExcept: Q = (s, d) =>
    Tables.customer(s, d).select(col("c_nationkey").as("k"))
      .except(
        Tables.supplier(s, d)
          .join(Tables.nation(s, d).filter(col("n_regionkey") === 0)
              .select(col("n_nationkey")),
            col("s_nationkey") === col("n_nationkey"), "left_semi")
          .select(col("s_nationkey").as("k")))
      .orderBy("k")

  val queries: Map[String, Q] = Map(
    "sort_multi_null" -> sortMultiNull,
    "limit_offset" -> limitOffset,
    "topk_global" -> topkGlobal,
    "topk_per_group" -> topkPerGroup,
    "sample_stratified" -> sampleStratified,
    "sample_split" -> sampleSplit,
    "sample_bottomk" -> sampleBottomK,
    "set_union_all" -> setUnionAll,
    "set_union_distinct" -> setUnionDistinct,
    "set_intersect" -> setIntersect,
    "set_except" -> setExcept,
    "set_intersect_all" -> setIntersectAll,
    "set_except_all" -> setExceptAll)

  val oracle: Map[String, String] = Map(
    "sort_multi_null" ->
      """SELECT o_orderkey, NULLIF(o_orderpriority, '1-URGENT') AS prio, o_orderstatus
         FROM orders
         ORDER BY prio ASC NULLS FIRST, o_orderstatus DESC, o_orderkey""",
    "limit_offset" ->
      """SELECT o_orderkey, o_custkey FROM orders
         ORDER BY o_orderkey LIMIT 20 OFFSET 20""",
    "topk_global" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY CAST(o_totalprice AS DECIMAL(18,4)) DESC, o_orderkey
         LIMIT 10""",
    "topk_per_group" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
           SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY CAST(o_totalprice AS DECIMAL(18,4)) DESC, o_orderkey) AS rn
           FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "sample_stratified" ->
      """SELECT lang, rn, doc_id FROM (
           SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
           FROM (SELECT lang, doc_id,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
                 FROM documents) t) r
         WHERE rn <= 5 ORDER BY lang, rn""",
    "sample_split" ->
      """SELECT doc_id,
           CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
         FROM (SELECT doc_id,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 AS b
               FROM documents) t
         ORDER BY doc_id""",
    "sample_bottomk" ->
      """SELECT doc_id, md5(text || '|' || CAST(doc_id AS VARCHAR)) AS hk
         FROM documents ORDER BY hk LIMIT 100""",
    "set_union_all" ->
      """SELECT k FROM (
           SELECT o_custkey AS k FROM orders
           UNION ALL SELECT c_custkey FROM customer) t
         ORDER BY k""",
    "set_union_distinct" ->
      """SELECT k FROM (
           SELECT o_custkey AS k FROM orders
           UNION SELECT c_custkey FROM customer) t
         ORDER BY k""",
    "set_intersect" ->
      """SELECT k FROM (
           SELECT c_nationkey AS k FROM customer
           INTERSECT SELECT s_nationkey FROM supplier) t
         ORDER BY k""",
    "set_except" ->
      """SELECT k FROM (
           SELECT c_nationkey AS k FROM customer
           EXCEPT
           SELECT s_nationkey FROM supplier
           WHERE s_nationkey IN
             (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)) t
         ORDER BY k""",
    "set_intersect_all" ->
      """SELECT k FROM (
           SELECT o_custkey AS k FROM orders WHERE o_orderkey % 2 = 0
           INTERSECT ALL
           SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 0) t
         ORDER BY k""",
    "set_except_all" ->
      """SELECT k FROM (
           SELECT o_custkey AS k FROM orders WHERE o_orderkey % 2 = 0
           EXCEPT ALL
           SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 0) t
         ORDER BY k""")
}
