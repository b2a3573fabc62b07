package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the 100 TB path for analytic ranks over a
  * whole table.
  *
  * Spark's `Window.orderBy(...)` with no partition key moves ALL rows to
  * one partition (WindowExec warns exactly that), which is fine for a
  * dimension-sized table and fatal at fact-table scale. The classic
  * two-pass alternative implemented here:
  *
  *  1. `repartitionByRange` on the sort key — rows land in globally
  *     ordered, evenly sized partitions (range boundaries from Spark's
  *     reservoir sample).
  *  2. Per-partition local `row_number` over a window PARTITIONED by the
  *     physical partition id — every partition ranks independently, no
  *     data movement.
  *  3. Per-partition counts (one tiny aggregate, O(partitions) rows) →
  *     cumulative offsets → broadcast join; global rank = offset +
  *     local rank.
  *
  * The only driver-side state is the per-partition count vector —
  * O(number of partitions), not O(rows).
  *
  * Requires a TOTAL order (add a unique tiebreak column, as all declared
  * rank queries here already do): with a total order, row_number, rank
  * and dense_rank coincide and percent_rank/cume_dist derive directly. */
object GlobalRank {

  /** Append `out` = global 1-based rank of each row under `keys` (must be
    * a total order). Distributed: no global single-partition window.
    *
    * The locally-ranked frame is `localCheckpoint`ed (eagerly, to
    * executor-local storage) BEFORE the plan branches into the offsets
    * aggregate and the final join, so both branches read the SAME physical
    * evaluation of the range shuffle. `repartitionByRange` samples its
    * boundaries per evaluation — two independent evaluations of the same
    * subtree can place a row in different partitions (the exact failure
    * [[Streaming]]'s late-watermark rewrite hit), which under task retry,
    * speculation, or a nondeterministic upstream silently mis-ranks rows.
    * The checkpoint trades one executor-local full-width write for that
    * determinism; the offsets branch then costs one O(partitions)
    * aggregate over the materialized rows instead of a second range
    * exchange. */
  def withGlobalRowNumber(df: DataFrame, keys: Seq[Column], out: String,
      numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, keys: _*)
      .withColumn("__gr_pid", spark_partition_id())
    val localW = Window.partitionBy("__gr_pid").orderBy(keys: _*)
    val local = ranged.withColumn("__gr_local", row_number().over(localW))
      .localCheckpoint()
    // O(partitions) rows: cumulative count of all partitions before pid
    val offsets = local.groupBy("__gr_pid").count()
      .withColumn("__gr_offset",
        coalesce(sum(col("count")).over(
          Window.orderBy("__gr_pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__gr_pid"), col("__gr_offset"))
    local.join(broadcast(offsets), "__gr_pid")
      .withColumn(out, col("__gr_offset") + col("__gr_local"))
      .drop("__gr_pid", "__gr_local", "__gr_offset")
  }

  /** percent_rank = (rank - 1) / (N - 1) and cume_dist = rank / N over a
    * total order, built on [[withGlobalRowNumber]] — returns the input
    * columns plus (rankCol, pctCol, cumeCol). N comes from a 1-row
    * broadcast, not a driver action. */
  def withGlobalPercentiles(df: DataFrame, keys: Seq[Column],
      rankCol: String, pctCol: String, cumeCol: String): DataFrame = {
    val ranked = withGlobalRowNumber(df, keys, rankCol)
    val n = df.select(count(lit(1)).as("__gr_n"))
    ranked.crossJoin(broadcast(n))
      .withColumn(pctCol,
        (col(rankCol) - 1).cast("double") /
          greatest(col("__gr_n") - 1, lit(1L)).cast("double"))
      .withColumn(cumeCol,
        col(rankCol).cast("double") / col("__gr_n").cast("double"))
      .drop("__gr_n")
  }
}
