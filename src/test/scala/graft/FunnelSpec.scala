package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.EventOps

/** Ordering semantics of the conversion funnel on a planted fixture:
  * a step only counts when it happens strictly AFTER the previous step. */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("funnel").toString
    val us = 1000000L // 1s in µs; ts column is int64 NANOseconds
    def ns(sec: Long) = sec * us * 1000L
    Seq(
      // user 1: full funnel in order
      (1L, ns(10), 1L, "view", 1.0, "{}"),
      (2L, ns(20), 1L, "click", 1.0, "{}"),
      (3L, ns(30), 1L, "purchase", 1.0, "{}"),
      // user 2: click BEFORE the first view — must not count; purchase
      // without a qualifying click — must not count either
      (4L, ns(20), 2L, "click", 1.0, "{}"),
      (5L, ns(30), 2L, "view", 1.0, "{}"),
      (6L, ns(40), 2L, "purchase", 1.0, "{}"),
      // user 3: view then click, purchase BEFORE the click
      (7L, ns(10), 3L, "view", 1.0, "{}"),
      (8L, ns(15), 3L, "purchase", 1.0, "{}"),
      (9L, ns(20), 3L, "click", 1.0, "{}"),
      // user 4: never views — outside the funnel entirely
      (10L, ns(10), 4L, "click", 1.0, "{}"),
      // user 1 extra: a second, later view must not move t_view
      (11L, ns(99), 1L, "view", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  test("steps only count strictly after the previous step; non-viewers excluded") {
    val out = EventOps.queries("funnel_steps")(spark, dir).collect()
      .map(r => (r.getLong(0),
        r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getInt(4)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val byUser = out.map(t => t._1 -> t).toMap
    // user 1: 10 -> 20 -> 30, furthest 3; first view wins
    assert(byUser(1L) == ((1L, 10000000L, 20000000L, 30000000L, 3)))
    // user 2: early click ignored; no click after view => purchase
    // cannot qualify even though it is after the view
    assert(byUser(2L) == ((2L, 30000000L, -1L, -1L, 1)))
    // user 3: purchase before click => stops at click
    assert(byUser(3L) == ((3L, 10000000L, 20000000L, -1L, 2)))
  }
}
