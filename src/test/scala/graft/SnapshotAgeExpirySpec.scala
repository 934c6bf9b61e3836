package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable

/** Age-based snapshot retention (round 14 — Iceberg's
  * `expire_snapshots(older_than)` policy beside the count-based one):
  * the grace resolves to a keep-count from the commit times STAMPED in
  * the log, and the existing sweep (with its ref-pin exemption) does the
  * rest. */
class SnapshotAgeExpirySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("expireSnapshotsOlderThan keeps young snapshots, expires old ones, honors pins") {
    val dir = TestSpark.tmpDir("gt-age-expire") + "/t"
    GraftTable.create(spark, dir, StructType(Seq(StructField("id", LongType))))
    GraftTable.load(spark, dir).append(Seq(1L).toDF("id")) // v1
    GraftTable.load(spark, dir).append(Seq(2L).toDF("id")) // v2
    Thread.sleep(60)
    val mid = System.currentTimeMillis() // v0..v2 are strictly older
    Thread.sleep(60)
    GraftTable.load(spark, dir).append(Seq(3L).toDF("id")) // v3 (young)
    GraftTable.load(spark, dir).createTag("pin1", 1)

    // a huge grace expires nothing
    GraftTable.load(spark, dir).expireSnapshotsOlderThan(24L * 3600 * 1000)
    assert(GraftTable.load(spark, dir).asOf(0).count() == 0)

    // grace = age of `mid`: v0..v2 are older -> expired, EXCEPT pinned v1
    GraftTable.load(spark, dir)
      .expireSnapshotsOlderThan(System.currentTimeMillis() - mid)
    val t = GraftTable.load(spark, dir)
    Seq(0, 2).foreach { v =>
      val e = intercept[Exception] { t.asOf(v).collect() }
      assert(e.getMessage.contains("expired"), s"v$v: ${e.getMessage}")
    }
    assert(t.asOf(1).count() == 1, "ref-pinned v1 must survive age expiry")
    assert(t.asOf(3).count() == 3, "the young head must survive")

    // zero grace = everything but the head (and pins)
    GraftTable.load(spark, dir).append(Seq(4L).toDF("id")) // v4
    GraftTable.load(spark, dir).expireSnapshotsOlderThan(0)
    val t2 = GraftTable.load(spark, dir)
    val e3 = intercept[Exception] { t2.asOf(3).collect() }
    assert(e3.getMessage.contains("expired"))
    assert(t2.asOf(1).count() == 1 && t2.toDF.count() == 4)
  }

  test("CALL apply_retention enforces the policy each table declares in its properties") {
    val wh = java.nio.file.Files.createTempDirectory("graft_pol_wh").toString
    val cat = s"gpol${java.util.UUID.randomUUID().toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT) USING graft")
    (1 to 3).foreach(i => spark.sql(s"INSERT INTO $cat.ns.t VALUES ($i)"))
    // no declared policy: the sweep is a no-op
    spark.sql(s"CALL $cat.system.apply_retention('ns.t')")
    assert(GraftTable.load(spark, s"$wh/ns/t").asOf(1).count() == 1,
      "apply_retention must no-op on a table with no declared policy")
    // declare keep-last=2 IN the table's own properties, then sweep
    spark.sql(s"ALTER TABLE $cat.ns.t SET TBLPROPERTIES('retention.keep-last'='2')")
    spark.sql(s"CALL $cat.system.apply_retention('ns.t')")
    // versions: v0 create, v1-v3 inserts, v4 the SET TBLPROPERTIES commit
    // itself; keep-last=2 keeps v3+v4 and expires v0-v2
    val t = GraftTable.load(spark, s"$wh/ns/t")
    Seq(1, 2).foreach { v =>
      val e = intercept[Exception] { t.asOf(v).collect() }
      assert(e.getMessage.contains("expired"), s"v$v: ${e.getMessage}")
    }
    assert(t.asOf(3).count() == 3, "keep-last=2 must keep the two newest snapshots")
    assert(t.toDF.count() == 3)
    // a malformed policy fails LOUDLY, it does not silently skip
    spark.sql(s"ALTER TABLE $cat.ns.t SET TBLPROPERTIES('retention.keep-last'='soon')")
    val bad = intercept[Exception] { spark.sql(s"CALL $cat.system.apply_retention('ns.t')") }
    assert(bad.getMessage.contains("retention.keep-last"))
  }

  test("SQL CALL expire_snapshots_older_than drives the same sweep") {
    val wh = java.nio.file.Files.createTempDirectory("graft_age_wh").toString
    val cat = s"gage${java.util.UUID.randomUUID().toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT) USING graft")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (1)")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (2)")
    spark.sql(s"CALL $cat.system.expire_snapshots_older_than('ns.t', 0L)")
    val t = GraftTable.load(spark, s"$wh/ns/t")
    val e = intercept[Exception] { t.asOf(1).collect() }
    assert(e.getMessage.contains("expired"))
    assert(t.toDF.count() == 2)
  }
}
