package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable

/** Free-form table properties in the snapshot log (round 14 — the
  * substrate the index-manifest pointer swap rides): one metadata-only
  * commit, versioned with the table, carried forward by every commit,
  * null removes, and the epoch-gated variant is exactly-once. */
class TablePropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def fresh(): String = {
    val dir = TestSpark.tmpDir("gt-props") + "/t"
    GraftTable.create(spark, dir, StructType(Seq(StructField("id", LongType))))
    dir
  }

  test("set, merge, remove; versioned with the snapshot; carried across commits") {
    val dir = fresh()
    GraftTable.load(spark, dir).setProperties(Map("a" -> "1", "b" -> "x"))
    val v1 = GraftTable.load(spark, dir).currentVersion
    assert(GraftTable.load(spark, dir).properties == Map("a" -> "1", "b" -> "x"))
    // merge keeps unnamed keys; null removes
    GraftTable.load(spark, dir).setProperties(Map("a" -> "2", "b" -> null))
    assert(GraftTable.load(spark, dir).properties == Map("a" -> "2"))
    // time travel: the v1 snapshot still answers the OLD properties
    assert(GraftTable.load(spark, dir).snapshotAt(v1).properties ==
      Map("a" -> "1", "b" -> "x"))
    // a data commit carries properties forward untouched
    GraftTable.load(spark, dir).append(Seq(1L, 2L).toDF("id"))
    assert(GraftTable.load(spark, dir).properties == Map("a" -> "2"))
    // set-properties is a metadata-only op: an incremental (changelog)
    // read crosses it without error
    val t = GraftTable.load(spark, dir)
    assert(t.appendsBetween(0, t.currentVersion).count() == 2)
  }

  test("setPropertiesEpoch is exactly-once per (queryId, epochId)") {
    val dir = fresh()
    assert(GraftTable.load(spark, dir).setPropertiesEpoch(Map("p" -> "1"), "q", 5L))
    val v = GraftTable.load(spark, dir).currentVersion
    // replay of the committed epoch: no commit, no version bump
    assert(!GraftTable.load(spark, dir).setPropertiesEpoch(Map("p" -> "2"), "q", 5L))
    assert(GraftTable.load(spark, dir).currentVersion == v)
    assert(GraftTable.load(spark, dir).properties == Map("p" -> "1"))
    // the next epoch lands
    assert(GraftTable.load(spark, dir).setPropertiesEpoch(Map("p" -> "2"), "q", 6L))
    assert(GraftTable.load(spark, dir).properties == Map("p" -> "2"))
  }

  test("properties survive the JSON round-trip bit-exactly (escaping, unicode)") {
    val dir = fresh()
    val nasty = Map("quote\"key" -> "line\nbreak\tand \\ slash",
      "unicode" -> "héllo — ≤≥ 中文")
    GraftTable.load(spark, dir).setProperties(nasty)
    assert(GraftTable.load(spark, dir).properties == nasty)
  }
}
