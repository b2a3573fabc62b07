package graft.ops

import graft.{Q, Tables}
import graft.Tables.{dec4, scaledLong}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.5 window functions.
  *
  * Every window here partitions by a real key (customer / user), so work
  * distributes across executors; only `win_ntile_pct` is a global window
  * (analytic over all customers), which at 100 TB would need a
  * range-partitioned two-pass rank — acceptable for a declared analytic op
  * over a dimension-sized table. All value columns go through DECIMAL
  * before any frame aggregation (SURVEY.md §0 discipline).
  */
object Windows {

  val winRankDenseRow: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(dec4(col("o_totalprice")).desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val winLagLead: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val v = dec4(col("value"))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        scaledLong((v - lag(v, 1).over(w)).cast(DecimalType(18, 4)), 4)
          .as("delta_prev_e4"),
        scaledLong((lead(v, 1).over(w) - v).cast(DecimalType(18, 4)), 4)
          .as("delta_next_e4"))
      .orderBy("event_id")
  }

  val winRunningSum: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        scaledLong(sum(dec4(col("o_totalprice"))).over(w)
          .cast(DecimalType(18, 4)), 4).as("running_total_e4"))
      .orderBy("o_orderkey")
  }

  val winRangeFrame: Q = (s, d) => {
    val day = datediff(col("o_orderdate"), to_date(lit("1990-01-01")))
    val w = Window.partitionBy("o_custkey").orderBy(col("day"))
      .rangeBetween(-7, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("day", day.cast(LongType))
      .select(col("o_orderkey"), col("day"),
        scaledLong(sum(dec4(col("o_totalprice"))).over(w)
          .cast(DecimalType(18, 4)), 4).as("sum_7d_e4"))
      .orderBy("o_orderkey")
  }

  /** Global analytics over all customers — via the two-pass distributed
    * rank ([[GlobalRank]]) instead of Spark's partition-less window
    * (which would move the whole table to one partition; WindowExec warns
    * exactly that). Under the total order (acctbal, custkey) the
    * row_number IS the rank, and ntile / percent_rank / cume_dist derive
    * arithmetically: first (N mod k) buckets get ceil(N/k) rows,
    * pct = (rn-1)/(N-1), cume = rn/N — the standard SQL definitions both
    * engines implement, so the oracle (native DuckDB window functions)
    * still hash-matches. */
  val winNtilePct: Q = (s, d) => {
    val keys = Seq(dec4(col("c_acctbal")), col("c_custkey"))
    val n = Tables.customer(s, d).select(count(lit(1)).as("n"))
    GlobalRank.withGlobalRowNumber(Tables.customer(s, d), keys, "rn")
      .crossJoin(broadcast(n))
      .withColumn("q", expr("n div 4"))
      .withColumn("r", col("n") % 4)
      .withColumn("quartile",
        when(col("rn") <= col("r") * (col("q") + 1),
          expr("(rn - 1) div (q + 1) + 1"))
        .otherwise(expr("r + (rn - r * (q + 1) - 1) div q + 1")))
      .withColumn("pct_rank_e6", scaledLong(
        ((col("rn") - 1).cast(DoubleType) /
          greatest(col("n") - 1, lit(1L)).cast(DoubleType))
          .cast(DecimalType(18, 6)), 6))
      .withColumn("cume_e6", scaledLong(
        (col("rn").cast(DoubleType) / col("n").cast(DoubleType))
          .cast(DecimalType(18, 6)), 6))
      .select(col("c_custkey"), col("quartile"), col("pct_rank_e6"), col("cume_e6"))
      .orderBy("c_custkey")
  }

  /** Global rank of every order by price — declared form of [[GlobalRank]]:
    * range-repartition on the sort key, rank locally, add broadcast
    * per-partition offsets. Same result as a partition-less row_number
    * window without moving the table to one partition — the rank an
    * operator at fact-table scale has to use. */
  val winGlobalRank: Q = (s, d) =>
    GlobalRank.withGlobalRowNumber(Tables.orders(s, d),
        Seq(dec4(col("o_totalprice")).desc, col("o_orderkey")), "global_rank")
      .select(col("o_orderkey"), col("global_rank"))
      .orderBy("o_orderkey")

  val winFirstLast: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .select(col("event_id"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"))
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(
    "win_rank_dense_row" -> winRankDenseRow,
    "win_lag_lead" -> winLagLead,
    "win_running_sum" -> winRunningSum,
    "win_range_frame" -> winRangeFrame,
    "win_ntile_pct" -> winNtilePct,
    "win_global_rank" -> winGlobalRank,
    "win_first_last" -> winFirstLast)

  val oracle: Map[String, String] = Map(
    "win_rank_dense_row" ->
      """SELECT o_custkey, o_orderkey,
           rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
           row_number() OVER w AS rn
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
           ORDER BY CAST(o_totalprice AS DECIMAL(18,4)) DESC, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "win_lag_lead" ->
      """SELECT event_id, user_id,
           CAST(CAST(CAST(CAST(value AS DECIMAL(18,4)) - lag(CAST(value AS DECIMAL(18,4))) OVER w AS DECIMAL(18,4)) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS delta_prev_e4,
           CAST(CAST(CAST(lead(CAST(value AS DECIMAL(18,4))) OVER w - CAST(value AS DECIMAL(18,4)) AS DECIMAL(18,4)) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS delta_next_e4
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
         ORDER BY event_id""",
    "win_running_sum" ->
      """SELECT o_orderkey, o_custkey,
           CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DECIMAL(18,4)) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS running_total_e4
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY o_orderkey""",
    "win_range_frame" ->
      """SELECT o_orderkey, day,
           CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DECIMAL(18,4)) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS sum_7d_e4
         FROM (SELECT *, datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS day
               FROM orders) t
         WINDOW w AS (PARTITION BY o_custkey ORDER BY day
           RANGE BETWEEN 7 PRECEDING AND CURRENT ROW)
         ORDER BY o_orderkey""",
    "win_ntile_pct" ->
      """SELECT c_custkey,
           ntile(4) OVER w AS quartile,
           CAST(CAST(CAST(percent_rank() OVER w AS DECIMAL(18,6)) AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS pct_rank_e6,
           CAST(CAST(CAST(cume_dist() OVER w AS DECIMAL(18,6)) AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS cume_e6
         FROM customer
         WINDOW w AS (ORDER BY CAST(c_acctbal AS DECIMAL(18,4)), c_custkey)
         ORDER BY c_custkey""",
    "win_global_rank" ->
      """SELECT o_orderkey,
           row_number() OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,4)) DESC,
                              o_orderkey) AS global_rank
         FROM orders ORDER BY o_orderkey""",
    "win_first_last" ->
      """SELECT event_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER w AS last_type
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY event_id""")
}
