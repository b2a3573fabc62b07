package graft.ops

import graft.{Q, Tables}
import graft.Tables.{dec4, dec6}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.4 aggregation operators.
  *
  * Everything here is a hash aggregate with map-side partial aggregation —
  * the shape that scales linearly with data and cluster size. DOUBLE
  * columns are cast to DECIMAL(18,4) *before* aggregating so sums are
  * exact and partition-order-independent (SURVEY.md §0).
  */
object Aggs {

  /** TPC-H Q1 shape: scan → filter-free groupBy → hash agg → sort. */
  val aggGroupbySums: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(dec4(col("l_quantity"))).cast(DecimalType(18, 4)).as("sum_qty"),
        sum(dec4(col("l_extendedprice"))).cast(DecimalType(18, 4)).as("sum_price"),
        (sum(dec4(col("l_quantity"))) / count(lit(1)))
          .cast(DecimalType(18, 6)).as("avg_qty"))
      .orderBy("l_returnflag", "l_linestatus")

  val queries: Map[String, Q] = Map(
    "agg_groupby_sums" -> aggGroupbySums)

  val oracle: Map[String, String] = Map(
    "agg_groupby_sums" ->
      """SELECT l_returnflag, l_linestatus,
         count(*) AS n_rows,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_price,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) / count(*) AS DECIMAL(18,6)) AS avg_qty
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""")
}
