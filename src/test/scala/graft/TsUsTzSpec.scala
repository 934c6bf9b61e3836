package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ts_us must be identical to DuckDB's epoch_us(ts) REGARDLESS of
  * spark.sql.session.timeZone — the conversion is pure date/extract
  * arithmetic, so flipping the per-query local timezone must not move it.
  * (First five epoch values pinned from `epoch_us(ts)` on the same file.) */
class TsUsTzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val expected = Seq(1704067798778549L, 1704068166738090L,
    1704068217102229L, 1704073540167754L, 1704075743261694L)

  private def firstFive(): Seq[Long] =
    graft.ops.Tables.eventsWithTs(spark, "/root/testdata/sf0.001")
      .orderBy("event_id").select("ts_us").limit(5)
      .collect().map(_.getLong(0)).toSeq

  test("ts_us matches DuckDB epoch_us under UTC and under a shifted tz") {
    assert(firstFive() == expected)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(firstFive() == expected, "ts_us drifted with session.timeZone")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
