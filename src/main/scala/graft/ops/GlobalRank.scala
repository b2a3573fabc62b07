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
    * Chunk assignment is DETERMINISTIC BY CONSTRUCTION (round-7; replaces
    * a `localCheckpoint` of the full-width table): the chunk id derives
    * arithmetically from the first sort key's (min, max) — the
    * [[Streaming]] late-watermark pattern — attached as a broadcast
    * 1-row frame, so a row's chunk is a pure function of its own values
    * and the key bounds. `repartitionByRange` + `spark_partition_id` is
    * NOT that (its sampled boundaries differ between two evaluations of
    * the same subtree, silently mis-ranking under task retry/speculation
    * — the failure the late-watermark rewrite hit), and the checkpoint
    * that papered over it materialized every column to the block manager.
    * Here the offsets branch re-evaluates only a column-pruned scan of
    * the first key, and re-evaluation is safe because the chunk
    * expression is value-deterministic. No driver-side action at all:
    * the bounds ride a broadcast, the offsets stay O(chunks).
    *
    * Chunk boundaries only affect BALANCE, never correctness: any fixed
    * monotone key→chunk map gives a correct rank (ties share a chunk,
    * and the in-chunk window orders by the full key tuple). Linear
    * interpolation balances uniform-ish first keys (the analytic-rank
    * norm); a heavily value-skewed key concentrates chunks — callers own
    * choosing a spread leading key, same contract as any range
    * partitioning. The first key must be numeric-castable; nulls follow
    * Spark's default placement (first under asc, last under desc), NaN
    * sorts largest. Requires a deterministic input (both branches
    * re-evaluate `df` — true of every non-checkpointing formulation). */
  def withGlobalRowNumber(df: DataFrame, keys: Seq[Column], out: String,
      numPartitions: Int = 0): DataFrame = {
    val bucketed = withChunkId(df, keys, numPartitions)
    val localW = Window.partitionBy("__gr_pid").orderBy(keys: _*)
    val local = bucketed.withColumn("__gr_local", row_number().over(localW))
    // O(chunks) rows from a key-column-pruned scan: cumulative count of
    // all chunks before pid
    val offsets = bucketed.groupBy("__gr_pid").count()
      .withColumn("__gr_offset",
        coalesce(sum(col("count")).over(
          Window.orderBy("__gr_pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__gr_pid"), col("__gr_offset"))
    local.join(broadcast(offsets), "__gr_pid")
      .withColumn(out, col("__gr_offset") + col("__gr_local"))
      .drop("__gr_pid", "__gr_local", "__gr_offset")
  }

  /** Append `out` = 1-based rank within each `groupCols` group under the
    * total order `keys` — the PER-GROUP sibling of [[withGlobalRowNumber]]
    * for low-cardinality groups over fact-scale rows. A plain
    * `Window.partitionBy(group)` ranks each whole group inside one task:
    * 5 languages over a 100 TB corpus means 5 tasks sort 20 TB each. Here
    * every group splits into `numPartitions` arithmetic chunks, so
    * parallelism is groups × chunks regardless of group skew.
    *
    * `chunkKey` must be a NUMERIC column monotone non-decreasing in
    * `keys.head` (ties may share a chunk — in-chunk windows order by the
    * full key tuple, so only balance is affected; defaults to `keys.head`
    * cast to double). Chunk ids derive from the key's per-group broadcast
    * (min, max) — deterministic by construction, the
    * [[withGlobalRowNumber]] contract. The offsets frame is
    * O(groups × chunks) rows and must stay broadcast-sized; its
    * cumulative window partitions BY GROUP over that aggregated frame,
    * never over data rows. */
  def withGroupedRowNumber(df: DataFrame, groupCols: Seq[String],
      keys: Seq[Column], out: String, chunkKey: Option[Column] = None,
      numPartitions: Int = 0): DataFrame = {
    val gcols = groupCols.map(col)
    val bucketed = withGroupedChunkId(df, groupCols, keys, chunkKey,
      numPartitions)
    val localW = Window.partitionBy(gcols :+ col("__gr_pid"): _*)
      .orderBy(keys: _*)
    val local = bucketed.withColumn("__gr_local", row_number().over(localW))
    val offsets = bucketed.groupBy(gcols :+ col("__gr_pid"): _*).count()
      .withColumn("__gr_offset",
        coalesce(sum(col("count")).over(
          Window.partitionBy(gcols: _*).orderBy("__gr_pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(gcols :+ col("__gr_pid") :+ col("__gr_offset"): _*)
    nullSafeBroadcastJoin(local, offsets, groupCols :+ "__gr_pid")
      .withColumn(out, col("__gr_offset") + col("__gr_local"))
      .drop("__gr_pid", "__gr_local", "__gr_offset")
  }

  /** The rows of each `groupCols` group at caller-chosen in-group RANKS
    * (1-based, under the total order `keys`) — the order-statistics
    * sibling of [[withGroupedRowNumber]] for queries that keep only a
    * few ranks per group (exact median, discrete quantiles). Ranking
    * every row to then discard all but 2-3 per group pays a full sort
    * exchange over the fact table; here only the chunks whose rank
    * interval [offset+1, offset+count] contains a wanted rank are
    * window-sorted — with the default chunk count that is a ~3/32
    * slice, and the chunk-count aggregate that decides it ships
    * O(groups × chunks) rows (r19: this halved agg_exact_median /
    * agg_quartiles). Selection is rank-identical to ranking everything:
    * chunk ids, offsets and the in-chunk total order are byte-identical
    * to [[withGroupedRowNumber]]'s, so the surviving rows carry the
    * same `out` rank they would have had there.
    *
    * `wanted` maps the per-group count frame (groupCols + `n` BIGINT) to
    * a frame of (groupCols + `__gr_want` BIGINT) wanted ranks — both are
    * group-cardinality-sized and ride broadcasts. Returns the selected
    * rows with `out` (the in-group rank) and `__gr_n` (the group's row
    * count) appended. */
  def groupedRowsAtRanks(df: DataFrame, groupCols: Seq[String],
      keys: Seq[Column], out: String,
      wanted: DataFrame => DataFrame, chunkKey: Option[Column] = None,
      numPartitions: Int = 0): DataFrame = {
    val gcols = groupCols.map(col)
    val bucketed = withGroupedChunkId(df, groupCols, keys, chunkKey,
      numPartitions)
    // O(groups × chunks); referenced by the offsets window AND the
    // per-group totals — materialize once instead of re-running the
    // count aggregate (and its scan) per reference
    val chunkCounts = graft.util.Ckpt.narrow(
      bucketed.groupBy(gcols :+ col("__gr_pid"): _*).count())
    val withOff = chunkCounts
      .withColumn("__gr_offset",
        coalesce(sum(col("count")).over(
          Window.partitionBy(gcols: _*).orderBy("__gr_pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val nPer = chunkCounts.groupBy(gcols: _*)
      .agg(sum(col("count")).as("n"))
    val want = wanted(nPer)
    def nullSafeOn(l: DataFrame, r: DataFrame, cs: Seq[String],
        extra: Column): DataFrame = {
      val rr = cs.foldLeft(r)((d, c) => d.withColumnRenamed(c, s"__gr_w_$c"))
      l.join(broadcast(rr),
        cs.map(c => col(c) <=> col(s"__gr_w_$c")).reduce(_ && _) && extra)
    }
    // chunks whose global-rank interval contains a wanted rank
    val needed = nullSafeOn(withOff, want, groupCols,
        col("__gr_want") > col("__gr_offset") &&
          col("__gr_want") <= col("__gr_offset") + col("count"))
      .select(gcols :+ col("__gr_pid") :+ col("__gr_offset"): _*)
      .distinct()
    val localW = Window.partitionBy(gcols :+ col("__gr_pid"): _*)
      .orderBy(keys: _*)
    val ranked = nullSafeBroadcastJoin(bucketed, needed,
        groupCols :+ "__gr_pid")
      .withColumn(out, col("__gr_offset") + row_number().over(localW))
    // keep exactly the wanted ranks; attach the group's row count
    val sel = nullSafeOn(ranked, want.select(gcols :+ col("__gr_want"): _*)
        .distinct(), groupCols, col(out) === col("__gr_want"))
      .drop(groupCols.map(c => s"__gr_w_$c") :+ "__gr_want": _*)
    nullSafeBroadcastJoin(sel,
        nPer.withColumnRenamed("n", "__gr_n"), groupCols)
      .drop("__gr_pid", "__gr_offset")
  }

  /** Append `out` = inclusive running sum of `value` within each
    * `groupCols` group under the total order `keys` — the PER-GROUP
    * sibling of [[withGlobalRunningSum]], same contract as
    * [[withGroupedRowNumber]]: every group splits into arithmetic
    * chunks, so a low-cardinality group key (22 chromosomes, 5
    * languages) never serializes into one task per group. `value` must
    * be exact-arithmetic (integer/decimal) for a deterministic result. */
  def withGroupedRunningSum(df: DataFrame, groupCols: Seq[String],
      keys: Seq[Column], value: Column, out: String,
      chunkKey: Option[Column] = None, numPartitions: Int = 0): DataFrame =
    withGroupedRunningSums(df, groupCols, keys, Seq(value -> out),
      chunkKey, numPartitions)

  /** N independent running sums over ONE sweep (r20, the sum-monoid
    * sibling of [[withGroupedRunningMaxes]]): every `values` pair
    * (value, out) gets its own inclusive running sum under the shared
    * total order — one window pass, one offsets aggregate, one
    * broadcast join, however many summands ride along. What the
    * multi-expression frequency sweep needs: one endpoint sweep carries
    * every expression's ±pool delta instead of one sweep (or one
    * containment join) per expression. Each `value` must be
    * exact-arithmetic, the [[withGroupedRunningSum]] contract. */
  def withGroupedRunningSums(df: DataFrame, groupCols: Seq[String],
      keys: Seq[Column], values: Seq[(Column, String)],
      chunkKey: Option[Column] = None, numPartitions: Int = 0): DataFrame = {
    require(values.nonEmpty, "withGroupedRunningSums needs >= 1 (value, out) pair")
    val gcols = groupCols.map(col)
    val idx = values.indices
    val tagged = idx.foldLeft(df)((d, i) =>
      d.withColumn(s"__gr_val$i", values(i)._1))
    val bucketed = withGroupedChunkId(tagged, groupCols, keys, chunkKey,
      numPartitions)
    val localW = Window.partitionBy(gcols :+ col("__gr_pid"): _*)
      .orderBy(keys: _*).rowsBetween(Window.unboundedPreceding, 0)
    val local = idx.foldLeft(bucketed)((d, i) =>
      d.withColumn(s"__gr_local$i", sum(col(s"__gr_val$i")).over(localW)))
    val offW = Window.partitionBy(gcols: _*).orderBy("__gr_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val tots = idx.map(i => sum(col(s"__gr_val$i")).as(s"__gr_tot$i"))
    val offsets = bucketed.groupBy(gcols :+ col("__gr_pid"): _*)
      .agg(tots.head, tots.tail: _*)
      .select(gcols ++ Seq(col("__gr_pid")) ++ idx.map(i =>
        coalesce(sum(col(s"__gr_tot$i")).over(offW), lit(0L))
          .as(s"__gr_offset$i")): _*)
    val joined = nullSafeBroadcastJoin(local, offsets, groupCols :+ "__gr_pid")
    idx.foldLeft(joined)((d, i) =>
        d.withColumn(values(i)._2,
          col(s"__gr_offset$i") + col(s"__gr_local$i")))
      .drop("__gr_pid" +: idx.flatMap(i =>
        Seq(s"__gr_local$i", s"__gr_offset$i", s"__gr_val$i")): _*)
  }

  /** Append `out` = inclusive running MAX of `value` within each
    * `groupCols` group under the total order `keys` — the max-monoid
    * sibling of [[withGroupedRunningSum]] (same chunking contract):
    * per-chunk local running max plus an O(groups × chunks) exclusive
    * prefix-max broadcast, combined with `greatest` (which skips nulls,
    * so a null `value` row simply carries the prefix forward and `out`
    * is null only while NO non-null value has occurred yet in the
    * group — exactly the open-left-edge semantics a sweep wants). */
  def withGroupedRunningMax(df: DataFrame, groupCols: Seq[String],
      keys: Seq[Column], value: Column, out: String,
      chunkKey: Option[Column] = None, numPartitions: Int = 0): DataFrame =
    withGroupedRunningMaxes(df, groupCols, keys, Seq(value -> out),
      chunkKey, numPartitions)

  /** N independent running maxes over ONE sweep (r19): every `values`
    * pair (value, out) gets its own inclusive running max under the
    * shared total order — one window pass, one offsets aggregate, one
    * broadcast join, however many monoids ride along. Callers that used
    * to run one sweep per value column (nearest-region's coverage flag
    * + prev-end distance) fuse them by tagging each event row with one
    * non-null value column and nulls elsewhere: max skips nulls, so each
    * output column sees only its own events. */
  def withGroupedRunningMaxes(df: DataFrame, groupCols: Seq[String],
      keys: Seq[Column], values: Seq[(Column, String)],
      chunkKey: Option[Column] = None, numPartitions: Int = 0): DataFrame = {
    require(values.nonEmpty, "withGroupedRunningMaxes needs >= 1 (value, out) pair")
    val gcols = groupCols.map(col)
    val idx = values.indices
    val tagged = idx.foldLeft(df)((d, i) =>
      d.withColumn(s"__gr_val$i", values(i)._1))
    val bucketed = withGroupedChunkId(tagged, groupCols, keys, chunkKey,
      numPartitions)
    val localW = Window.partitionBy(gcols :+ col("__gr_pid"): _*)
      .orderBy(keys: _*).rowsBetween(Window.unboundedPreceding, 0)
    val local = idx.foldLeft(bucketed)((d, i) =>
      d.withColumn(s"__gr_local$i", max(col(s"__gr_val$i")).over(localW)))
    val offW = Window.partitionBy(gcols: _*).orderBy("__gr_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val tots = idx.map(i => max(col(s"__gr_val$i")).as(s"__gr_tot$i"))
    val offsets = bucketed.groupBy(gcols :+ col("__gr_pid"): _*)
      .agg(tots.head, tots.tail: _*)
      .select(gcols ++ Seq(col("__gr_pid")) ++
        idx.map(i => max(col(s"__gr_tot$i")).over(offW).as(s"__gr_offset$i")): _*)
    val joined = nullSafeBroadcastJoin(local, offsets, groupCols :+ "__gr_pid")
    idx.foldLeft(joined)((d, i) =>
        d.withColumn(values(i)._2,
          greatest(col(s"__gr_offset$i"), col(s"__gr_local$i"))))
      .drop("__gr_pid" +: idx.flatMap(i =>
        Seq(s"__gr_local$i", s"__gr_offset$i", s"__gr_val$i")): _*)
  }

  /** Broadcast inner join on `keys` with NULL-SAFE equality (`<=>`):
    * `Window.partitionBy` treats NULL as a group of its own, so the
    * grouped chunked forms must too — a plain equi-join would silently
    * DROP every null-group row (null != null), losing rows rather than
    * misranking them. EqualNullSafe is still an equi-join key to the
    * planner, so this stays a broadcast hash join. */
  private def nullSafeBroadcastJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String]): DataFrame = {
    val r = keys.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"__gr_r_$c"))
    val cond = keys.map(c => col(c) <=> col(s"__gr_r_$c")).reduce(_ && _)
    left.join(broadcast(r), cond).drop(keys.map(c => s"__gr_r_$c"): _*)
  }

  /** Shared per-group deterministic chunk assignment: `__gr_pid` derives
    * arithmetically from `chunkKey`'s per-group broadcast (min, max) —
    * the grouped form of [[withChunkId]]. `chunkKey` must be NUMERIC and
    * monotone non-decreasing in `keys.head` (ties may share a chunk —
    * in-chunk windows order by the full key tuple, so only balance is
    * affected; defaults to `keys.head` cast to double). */
  private def withGroupedChunkId(df: DataFrame, groupCols: Seq[String],
      keys: Seq[Column], chunkKey: Option[Column],
      numPartitions: Int): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    import org.apache.spark.sql.GraftPlanBridge
    import org.apache.spark.sql.catalyst.expressions.{Descending, SortOrder}
    val (firstE, desc) = GraftPlanBridge.expression(keys.head) match {
      case SortOrder(c, dir, _, _) => (c, dir == Descending)
      case e => (e, false)
    }
    val ck = chunkKey.getOrElse(GraftPlanBridge.column(firstE)).cast("double")
    val gcols = groupCols.map(col)
    val bounds = df.groupBy(gcols: _*)
      .agg(min(ck).as("__gr_lo"), max(ck).as("__gr_hi"))
    // degenerate span (all of a group's keys equal) → everything in
    // chunk 0; guarded explicitly because ANSI mode makes 0/0 an error,
    // not a null
    val span = col("__gr_hi") - col("__gr_lo")
    val lin = when(span === 0d, lit(0))
      .otherwise(floor((ck - col("__gr_lo")) / span * parts)).cast("int")
    val ascChunk = when(isnan(ck), lit(parts - 1))
      .otherwise(least(greatest(lin, lit(0)), lit(parts - 1)))
    val chunk = if (desc) lit(parts - 1) - ascChunk else ascChunk
    nullSafeBroadcastJoin(df, bounds, groupCols)
      .withColumn("__gr_pid",
        when(ck.isNull, lit(if (desc) parts else -1)).otherwise(chunk))
      .drop("__gr_lo", "__gr_hi")
  }

  /** Append `out` = inclusive global running sum of `value` under the
    * total order `keys` — the prefix-sum sibling of
    * [[withGlobalRowNumber]], sharing the same deterministic arithmetic
    * chunk assignment. Per-chunk local running sums plus an O(chunks)
    * cumulative-offset broadcast: no single-partition global window at
    * any width. `value` must be exact-arithmetic (integer/decimal) for
    * a deterministic result — float prefix sums are order-fragile by
    * nature, which is exactly what the declared queries avoid. */
  def withGlobalRunningSum(df: DataFrame, keys: Seq[Column], value: Column,
      out: String, numPartitions: Int = 0): DataFrame = {
    val bucketed = withChunkId(df.withColumn("__gr_val", value), keys,
      numPartitions)
    val localW = Window.partitionBy("__gr_pid").orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = bucketed.withColumn("__gr_local", sum(col("__gr_val")).over(localW))
    val offsets = bucketed.groupBy("__gr_pid")
      .agg(sum(col("__gr_val")).as("__gr_tot"))
      .withColumn("__gr_offset",
        coalesce(sum(col("__gr_tot")).over(
          Window.orderBy("__gr_pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__gr_pid"), col("__gr_offset"))
    local.join(broadcast(offsets), "__gr_pid")
      .withColumn(out, col("__gr_offset") + col("__gr_local"))
      .drop("__gr_pid", "__gr_local", "__gr_offset", "__gr_val")
  }

  /** The shared deterministic chunk assignment (scaladoc on
    * [[withGlobalRowNumber]]): `__gr_pid` derives arithmetically from the
    * first sort key's broadcast (min, max) — a pure function of the row's
    * own values, safe under re-evaluation/retry/speculation. */
  private def withChunkId(df: DataFrame, keys: Seq[Column],
      numPartitions: Int): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    import org.apache.spark.sql.GraftPlanBridge
    import org.apache.spark.sql.catalyst.expressions.{Descending, SortOrder}
    val (firstE, desc) = GraftPlanBridge.expression(keys.head) match {
      case SortOrder(c, dir, _, _) => (c, dir == Descending)
      case e => (e, false)
    }
    val firstCol = GraftPlanBridge.column(firstE).cast("double")
    val bounds = df.agg(min(firstCol).as("__gr_lo"), max(firstCol).as("__gr_hi"))
    // degenerate span (all keys equal) → chunk 0; guarded explicitly
    // because ANSI mode makes 0/0 an error, not a null (empty input's
    // null bounds still divide to null, which greatest() ignores)
    val gspan = col("__gr_hi") - col("__gr_lo")
    val lin = when(gspan === 0d, lit(0))
      .otherwise(floor((firstCol - col("__gr_lo")) / gspan * parts))
      .cast("int")
    val ascChunk = when(isnan(firstCol), lit(parts - 1))
      .otherwise(least(greatest(lin, lit(0)), lit(parts - 1)))
    val chunk = if (desc) lit(parts - 1) - ascChunk else ascChunk
    df.crossJoin(broadcast(bounds))
      .withColumn("__gr_pid",
        when(firstCol.isNull, lit(if (desc) parts else -1)).otherwise(chunk))
      .drop("__gr_lo", "__gr_hi")
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
