package graft.ops

import graft.{Q, Tables}
import graft.Tables.dec4
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  val setExcept: Q = (s, d) =>
    Tables.customer(s, d).select(col("c_nationkey").as("k"))
      .except(Tables.supplier(s, d).select(col("s_nationkey").as("k")))
      .orderBy("k")

  val queries: Map[String, Q] = Map(
    "sort_multi_null" -> sortMultiNull,
    "limit_offset" -> limitOffset,
    "topk_global" -> topkGlobal,
    "topk_per_group" -> topkPerGroup,
    "set_union_all" -> setUnionAll,
    "set_union_distinct" -> setUnionDistinct,
    "set_intersect" -> setIntersect,
    "set_except" -> setExcept)

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
           EXCEPT SELECT s_nationkey FROM supplier) t
         ORDER BY k""")
}
