package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event-log analytics semantics: sessionization boundaries, funnel
  * ordering, retention cohort invariants — checked against first
  * principles on sf0.001 (oracle hash parity is the driver's job). */
class EventsSpec extends AnyFunSuite {
  import TestSpark._

  private val GapMicros = 4L * 3600 * 1000 * 1000

  test("win_sessionize: intra-session gaps <= 4h, inter-session gaps > 4h, events partition exactly") {
    val ev = Tables.events(spark, sf0001)
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime]("ts")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(t =>
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000)).toMap
    val sessions = ops.Events.winSessionize(spark, sf0001).collect()
    // per user: session count == 1 + number of gaps > 4h, events sum up
    ev.foreach { case (u, ts) =>
      val expectedSessions = 1 + ts.sliding(2).count {
        case Array(a, b) =>
          java.time.Duration.between(a, b).toNanos / 1000 > GapMicros
        case _ => false
      }
      val mine = sessions.filter(_.getAs[Long]("user_id") == u)
      assert(mine.length == expectedSessions, s"user $u session count")
      assert(mine.map(_.getAs[Long]("n_events")).sum == ts.length,
        s"user $u events must partition into sessions")
      // sessions are disjoint, ordered, and separated by > 4h
      val spans = mine.sortBy(_.getAs[Long]("session_id"))
        .map(r => (r.getAs[java.time.LocalDateTime]("session_start"),
          r.getAs[java.time.LocalDateTime]("session_end")))
      spans.foreach { case (a, b) => assert(!b.isBefore(a)) }
      spans.sliding(2).foreach {
        case Array((_, e1), (s2, _)) =>
          assert(java.time.Duration.between(e1, s2).toNanos / 1000 > GapMicros,
            s"user $u consecutive sessions closer than the gap")
        case _ =>
      }
    }
  }

  test("events_funnel: stage timestamps strictly ordered and earliest-valid") {
    val rows = ops.Events.eventsFunnel(spark, sf0001).collect()
    val raw = Tables.events(spark, sf0001)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[java.time.LocalDateTime]("ts")))
    assert(rows.map(_.getAs[Long]("user_id")).toSet ==
      raw.map(_._1).toSet, "every user appears exactly once")
    rows.foreach { r =>
      val (u, stage) = (r.getAs[Long]("user_id"), r.getAs[Int]("stage"))
      val (t1, t2, t3) = (r.getAs[java.time.LocalDateTime]("view_ts"),
        r.getAs[java.time.LocalDateTime]("click_ts"),
        r.getAs[java.time.LocalDateTime]("purchase_ts"))
      assert((stage >= 1) == (t1 != null) && (stage >= 2) == (t2 != null)
        && (stage >= 3) == (t3 != null), s"user $u stage/timestamp mismatch")
      // brute-force earliest-completion on the raw events
      val mine = raw.filter(_._1 == u)
      def minAfter(tpe: String, after: java.time.LocalDateTime) =
        mine.filter(e => e._2 == tpe && (after == null || e._3.isAfter(after)))
          .map(_._3).reduceOption((a, b) => if (a.isBefore(b)) a else b).orNull
      val e1 = minAfter("view", null)
      val e2 = if (e1 == null) null else minAfter("click", e1)
      val e3 = if (e2 == null) null else minAfter("purchase", e2)
      assert(t1 == e1 && t2 == e2 && t3 == e3, s"user $u funnel timestamps")
    }
  }

  test("win_streaks: longest consecutive-day run matches brute force") {
    val dates = Tables.events(spark, sf0001)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    val got = ops.Events.winStreaks(spark, sf0001).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("streak_len"),
          r.getDate(2).toLocalDate, r.getDate(3).toLocalDate))).toMap
    assert(got.keySet == dates.keySet)
    dates.foreach { case (u, ds) =>
      // brute-force islands: split where the day step is not exactly 1
      val islands = ds.tail.foldLeft(Vector(Vector(ds.head))) { (acc, d) =>
        if (acc.last.last.plusDays(1) == d) acc.init :+ (acc.last :+ d)
        else acc :+ Vector(d)
      }
      val best = islands.maxBy(i => (i.size, -i.head.toEpochDay))
      val (len, s0, e0) = got(u)
      assert(len == best.size && s0 == best.head && e0 == best.last,
        s"user $u: got ($len,$s0,$e0) want (${best.size},${best.head},${best.last})")
    }
  }

  test("events_resample: dense hourly spine, zero-filled gaps, totals preserved") {
    val rows = ops.Events.eventsResample(spark, sf0001).collect()
    val byType = rows.groupBy(_.getString(0))
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toLocalDateTime))
    byType.foreach { case (t, cells) =>
      val hours = cells.map(_.getTimestamp(1).toLocalDateTime).sorted
      // spine is dense: consecutive cells exactly one hour apart
      hours.sliding(2).foreach {
        case Array(a, b) => assert(a.plusHours(1) == b,
          s"$t spine gap between $a and $b")
        case _ =>
      }
      val present = ev.filter(_._1 == t).map(_._2)
      assert(hours.head == present.min && hours.last == present.max,
        s"$t spine must span [first, last] event hour")
      // counts: zero exactly where no event fell, totals preserved
      val perHour = present.groupBy(identity).view.mapValues(_.size.toLong).toMap
      cells.foreach { c =>
        val h = c.getTimestamp(1).toLocalDateTime
        assert(c.getAs[Long]("n_events") == perHour.getOrElse(h, 0L),
          s"$t count at $h")
        if (!perHour.contains(h))
          assert(c.getAs[Long]("val_sum_e4") == 0L, s"$t gap not zero-filled at $h")
      }
      assert(cells.map(_.getAs[Long]("n_events")).sum == present.length,
        s"$t resample must preserve the event count")
    }
  }

  test("events_anomaly: flags exactly the cells a float z-score would, non-degenerate") {
    val got = ops.Events.eventsAnomaly(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toLocalDateTime)).toSet
    assert(got.nonEmpty, "fixture must contain at least one 3-sigma hour")
    // brute force: float mean/variance per type over the hourly series
    val cells = Tables.events(spark, sf0001)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toLocalDateTime))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((t, h), c) => (t, h, c) }
    val flagged = cells.groupBy(_._1).flatMap { case (_, cs) =>
      val n = cs.size.toDouble
      val mu = cs.map(_._3).sum / n
      val varc = cs.map(x => (x._3 - mu) * (x._3 - mu)).sum / n
      cs.filter(x => (x._3 - mu) * (x._3 - mu) > 9 * varc)
    }.map(x => (x._1, x._2)).toSet
    assert(got == flagged, "integer z-score must flag the float-z cell set")
  }

  test("events_retention: day-0 cell equals cohort size, counts never exceed it") {
    val ret = ops.Events.eventsRetention(spark, sf0001).collect()
    val cohortSize = Tables.events(spark, sf0001)
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("d0"))
      .groupBy("d0").count().collect()
      .map(r => r.getDate(0) -> r.getLong(1)).toMap
    assert(ret.nonEmpty)
    ret.groupBy(_.getDate(0)).foreach { case (d0, cells) =>
      val day0 = cells.find(_.getAs[Long]("day_offset") == 0L)
      assert(day0.isDefined, s"cohort $d0 missing day-0 cell")
      assert(day0.get.getAs[Long]("n_users") == cohortSize(d0),
        s"cohort $d0 day-0 must equal cohort size")
      cells.foreach { c =>
        assert(c.getAs[Long]("n_users") <= cohortSize(d0)
          && c.getAs[Long]("day_offset") >= 0L)
      }
    }
  }
}
