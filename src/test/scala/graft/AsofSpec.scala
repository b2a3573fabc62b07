package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** As-of join semantics against brute force on the fixture: backward =
  * latest event at-or-before, forward = earliest event at-or-after
  * within the 1-hour tolerance (null beyond it). */
class AsofSpec extends AnyFunSuite {
  import TestSpark._

  private implicit val ldtOrd: Ordering[java.time.LocalDateTime] =
    Ordering.by(d => (d.toEpochSecond(java.time.ZoneOffset.UTC), d.getNano))

  private lazy val ev = Tables.events(spark, sf0001)
    .groupBy("user_id", "ts").agg(max("event_id").as("event_id"))
    .collect()
    .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime]("ts"),
      r.getLong(2)))

  private lazy val ord = Tables.orders(spark, sf0001)
    .select(col("o_orderkey"), (col("o_custkey") % 97).as("uk"),
      expr("timestamp_ntz '2024-01-01 00:00:00' + make_dt_interval(0, 0, cast(o_orderkey % 43200 as int), 0)").as("asof_ts"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1),
      r.getAs[java.time.LocalDateTime]("asof_ts")))

  test("forward as-of with tolerance matches brute force, exercises all branches") {
    val got = ops.Joins.joinAsofFwd(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got.size == ord.length, "one row per order")
    var matched = 0; var toleranced = 0; var none = 0
    ord.foreach { case (ok, uk, t) =>
      val future = ev.filter(e => e._1 == uk && !e._2.isBefore(t))
      val within = future.filter(e => !e._2.isAfter(t.plusHours(1)))
      val want =
        if (within.nonEmpty) { matched += 1; Some(within.minBy(_._2)._3) }
        else if (future.nonEmpty) { toleranced += 1; None } // beyond tolerance
        else { none += 1; None }
      assert(got(ok) == want, s"order $ok at $t (uk=$uk)")
    }
    assert(matched > 0, "fixture degenerate: no in-tolerance match")
    assert(toleranced > 0, "fixture degenerate: no beyond-tolerance null")
  }

  test("backward as-of matches brute force") {
    val got = ops.Joins.joinAsof(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    ord.foreach { case (ok, uk, t) =>
      val past = ev.filter(e => e._1 == uk && !e._2.isAfter(t))
      val want = if (past.isEmpty) None else Some(past.maxBy(_._2)._3)
      assert(got(ok) == want, s"order $ok at $t (uk=$uk)")
    }
  }
}
