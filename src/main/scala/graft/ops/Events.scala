package graft.ops

import graft.{Q, Tables}
import graft.Tables.{dec4, scaledLong}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-log analytics — the sessionization / funnel / cohort-retention
  * triple every behavioral warehouse runs over its event stream. All
  * three are single-table pipelines whose only wide operations are
  * per-user-keyed (window or aggregate) shuffles: at 100 TB the event log
  * shuffles once on `user_id` (the natural high-cardinality key — no
  * skew beyond per-user activity, which AQE skew handling absorbs) and
  * every later stage is either co-partitioned on that key or an
  * aggregation of a results-sized frame. */
object Events {

  /** Gap-based sessionization: a user's events, ordered by (ts,
    * event_id), start a new session whenever the gap from the previous
    * event exceeds 4 hours; sessions then aggregate to (count, span,
    * exact value sum). The classic lag → boundary flag → running sum
    * composition: ONE shuffle on user_id serves both window functions,
    * and the session aggregate reuses the same key prefix. Interval
    * arithmetic stays on microsecond timestamps (no epoch-seconds
    * truncation), so the boundary decision is bit-exact on both
    * engines. */
  val winSessionize: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("ns",
        when(col("prev_ts").isNull
          || col("ts") > col("prev_ts") + expr("INTERVAL '4' HOUR"), 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("ns")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"), max("ts").as("session_end"),
        scaledLong(sum(dec4(col("value"))).cast(DecimalType(18, 4)), 4)
          .as("val_sum_e4"))
      .orderBy("user_id", "session_id")
  }

  /** Earliest-completion funnel (view → click → purchase): per user,
    * t1 = first view, t2 = first click strictly after t1, t3 = first
    * purchase strictly after t2; `stage` counts how far the user got.
    * ONE pass: the funnel events collect (nulls from the `when` guard
    * are skipped by collect_list, so non-funnel types never enter the
    * per-user state) into a ts-sorted array and a codegen'd `aggregate`
    * lambda runs the 3-state machine — semantically identical to the
    * oracle's 3-level min-after join chain but with a single shuffle.
    * Per-user state is bounded by the user's FUNNEL event count; for a
    * corpus where even that is unbounded, the same semantics fall back
    * to the oracle's agg→join→agg chain (3 co-partitioned shuffles). */
  val eventsFunnel: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(sort_array(collect_list(
        when(col("event_type").isin("view", "click", "purchase"),
          struct(col("ts"), col("event_type"))))).as("seq"))
      .withColumn("fin", expr(
        """aggregate(seq,
             named_struct('stage', 0,
               't1', CAST(NULL AS TIMESTAMP_NTZ),
               't2', CAST(NULL AS TIMESTAMP_NTZ),
               't3', CAST(NULL AS TIMESTAMP_NTZ)),
             (a, e) -> CASE
               WHEN a.stage = 0 AND e.event_type = 'view'
                 THEN named_struct('stage', 1, 't1', e.ts, 't2', a.t2, 't3', a.t3)
               WHEN a.stage = 1 AND e.event_type = 'click' AND e.ts > a.t1
                 THEN named_struct('stage', 2, 't1', a.t1, 't2', e.ts, 't3', a.t3)
               WHEN a.stage = 2 AND e.event_type = 'purchase' AND e.ts > a.t2
                 THEN named_struct('stage', 3, 't1', a.t1, 't2', a.t2, 't3', e.ts)
               ELSE a END)"""))
      .select(col("user_id"), col("fin.stage").as("stage"),
        col("fin.t1").as("view_ts"), col("fin.t2").as("click_ts"),
        col("fin.t3").as("purchase_ts"))
      .orderBy("user_id")

  /** Cohort retention: users cohort by their first active DATE; each
    * (cohort, day-offset) cell counts distinct users active that day.
    * The distinct (user, date) projection collapses the event log to at
    * most users × days rows BEFORE the cohort join, and both the first-
    * date aggregate and the join key on user_id — co-partitioned, no
    * third event-log-sized shuffle. Output is a days × days matrix:
    * driver-safe at any corpus scale. */
  val eventsRetention: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val first = ev.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort_date"))
    ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .join(first, "user_id")
      .select(col("cohort_date"),
        datediff(col("d"), col("cohort_date")).cast(LongType).as("day_offset"))
      .groupBy("cohort_date", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_date", "day_offset")
  }

  /** Gaps-and-islands: each user's longest run of CONSECUTIVE active
    * days (ties broken by earliest start). The date-minus-row_number
    * trick: over a user's distinct active dates in order, consecutive
    * days share `d - rn` — a constant per island — so islands fall out
    * of one per-user window plus a groupBy, no self-join. The distinct
    * (user, date) projection caps the windowed row count at users × days
    * regardless of event volume. */
  val winStreaks: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("d")
    val islands = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .withColumn("grp", date_sub(col("d"), row_number().over(w)))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("streak_len"),
        min("d").as("streak_start"), max("d").as("streak_end"))
    val best = Window.partitionBy("user_id")
      .orderBy(col("streak_len").desc, col("streak_start"))
    islands.withColumn("__rk", row_number().over(best))
      .filter(col("__rk") === 1)
      .select("user_id", "streak_len", "streak_start", "streak_end")
      .orderBy("user_id")
  }

  /** Gap-filled hourly resample — the time-series downsampling step every
    * metrics pipeline runs before charting or joining against other
    * series: per event_type, one row per hour between that type's first
    * and last event, zeros where nothing happened. The event log
    * aggregates FIRST (one shuffle, map-side combined, output bounded by
    * types × hours), and only then meets the dense hour spine — which is
    * generated from the per-type [min, max] span via `sequence`, i.e.
    * O(types × hours) rows with no scan of the log. Both sides of the
    * final left join are results-sized, so gap-filling costs nothing at
    * any corpus scale. */
  val eventsResample: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .withColumn("h", date_trunc("hour", col("ts")))
    val agg = ev.groupBy("event_type", "h")
      .agg(count(lit(1)).as("n_events"),
        scaledLong(sum(dec4(col("value"))).cast(DecimalType(18, 4)), 4)
          .as("val_sum_e4"))
    val spine = ev.groupBy("event_type")
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("event_type"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    spine.join(agg, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("val_sum_e4"), lit(0L)).as("val_sum_e4"))
      .orderBy("event_type", "h")
  }

  /** 3σ anomaly hours per event_type — the alerting query every metrics
    * pipeline runs over its resampled series. The z-score test is done
    * in EXACT integer algebra: (c−μ)² > 9σ² multiplied through by nh²
    * becomes (c·nh − s)² > 9·(nh·q − s²) over the per-type sufficient
    * statistics nh = #hours, s = Σc, q = Σc² — no floats, no sqrt, so
    * both engines flag the identical cell set (the float formulation
    * would be un-hashable at the σ boundary). Costs one shuffle for the
    * hourly counts; the per-type stats frame is O(types) and broadcast
    * back, so the flagging pass is shuffle-free. Magnitudes: c·nh ≤
    * corpus size, squared ≤ 10³⁸? No — (c·nh − s) is bounded by the
    * series total (≤ corpus rows ~2³⁰ at 100 TB per type·hour grain),
    * squared ≤ 2⁶⁰ — inside BIGINT. */
  val eventsAnomaly: Q = (s, d) => {
    val c = Tables.events(s, d)
      .withColumn("h", date_trunc("hour", col("ts")))
      .groupBy("event_type", "h").agg(count(lit(1)).as("n_events"))
    val st = c.groupBy("event_type").agg(
      count(lit(1)).as("nh"), sum("n_events").as("sv"),
      sum(col("n_events") * col("n_events")).as("qv"))
    c.join(broadcast(st), "event_type")
      .filter(expr(
        "(n_events*nh - sv)*(n_events*nh - sv) > 9*(nh*qv - sv*sv)"))
      .select("event_type", "h", "n_events")
      .orderBy("event_type", "h")
  }

  val queries: Map[String, Q] = Map(
    "win_sessionize" -> winSessionize,
    "events_funnel" -> eventsFunnel,
    "events_retention" -> eventsRetention,
    "events_resample" -> eventsResample,
    "events_anomaly" -> eventsAnomaly,
    "win_streaks" -> winStreaks)

  val oracle: Map[String, String] = Map(
    "win_sessionize" ->
      """WITH o AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
                      lag(CAST(ts AS TIMESTAMP)) OVER
                        (PARTITION BY user_id
                         ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_ts
                    FROM events),
            f AS (SELECT *, CASE WHEN prev_ts IS NULL
                                   OR ts > prev_ts + INTERVAL '4 hours'
                                 THEN 1 ELSE 0 END AS ns FROM o),
            s AS (SELECT *, sum(ns) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid FROM f)
         SELECT user_id, CAST(sid AS BIGINT) AS session_id,
                count(*) AS n_events,
                min(ts) AS session_start, max(ts) AS session_end,
                CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS val_sum_e4
         FROM s GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_funnel" ->
      """WITH v AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
                    FROM events WHERE event_type = 'view' GROUP BY 1),
            c AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
                  FROM events e JOIN v ON e.user_id = v.user_id
                    AND CAST(e.ts AS TIMESTAMP) > v.t1
                  WHERE e.event_type = 'click' GROUP BY 1),
            p AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
                  FROM events e JOIN c ON e.user_id = c.user_id
                    AND CAST(e.ts AS TIMESTAMP) > c.t2
                  WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT u.user_id,
                CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage,
                v.t1 AS view_ts, c.t2 AS click_ts, p.t3 AS purchase_ts
         FROM (SELECT DISTINCT user_id FROM events) u
         LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
         LEFT JOIN p USING (user_id)
         ORDER BY user_id""",
    "events_resample" ->
      """WITH ev AS (SELECT event_type,
                       date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, value
                     FROM events),
            agg AS (SELECT event_type, h, count(*) AS n_events,
                      CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS val_sum_e4
                    FROM ev GROUP BY 1, 2),
            sp AS (SELECT event_type,
                     unnest(generate_series(min(h), max(h),
                       INTERVAL 1 HOUR)) AS h
                   FROM ev GROUP BY event_type)
         SELECT sp.event_type, sp.h,
                COALESCE(n_events, 0) AS n_events,
                COALESCE(val_sum_e4, 0) AS val_sum_e4
         FROM sp LEFT JOIN agg
           ON sp.event_type = agg.event_type AND sp.h = agg.h
         ORDER BY 1, 2""",
    "events_anomaly" ->
      """WITH c AS (SELECT event_type,
                      date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
                      count(*) AS n_events
                    FROM events GROUP BY 1, 2),
            st AS (SELECT event_type, count(*) AS nh, sum(n_events) AS sv,
                     sum(n_events * n_events) AS qv
                   FROM c GROUP BY 1)
         SELECT c.event_type, c.h, c.n_events
         FROM c JOIN st ON c.event_type = st.event_type
         WHERE (c.n_events*st.nh - st.sv)*(c.n_events*st.nh - st.sv)
               > 9*(st.nh*st.qv - st.sv*st.sv)
         ORDER BY 1, 2""",
    "events_retention" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0
                    FROM events GROUP BY 1),
            a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
         SELECT f.d0 AS cohort_date,
                CAST(date_diff('day', f.d0, a.d) AS BIGINT) AS day_offset,
                count(*) AS n_users
         FROM a JOIN f USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "win_streaks" ->
      """WITH dd AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
            r AS (SELECT user_id, d,
                    row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
                  FROM dd),
            st AS (SELECT user_id, d - CAST(rn AS INTEGER) AS grp,
                     count(*) AS streak_len,
                     min(d) AS streak_start, max(d) AS streak_end
                   FROM r GROUP BY 1, 2)
         SELECT user_id, streak_len, streak_start, streak_end
         FROM st
         QUALIFY row_number() OVER (PARTITION BY user_id
                   ORDER BY streak_len DESC, streak_start) = 1
         ORDER BY user_id""")
}
