package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable

/** Equality-delete sets LARGER than `graft.delete.broadcastMaxRows` must
  * still scan — merged by a distributed scratch write and loaded once per
  * executor JVM, never collected on the driver (the old path hard-failed
  * with "compact() first" at 1M pending keys, a routine state for a busy
  * MoR table at scale). */
class LargeDeleteScanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var prior: Option[SparkSession] = None
  lazy val spark: SparkSession = {
    prior = SparkSession.getDefaultSession
    prior.foreach(_ => {
      SparkSession.clearDefaultSession(); SparkSession.clearActiveSession()
    })
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftSparkSessionExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  import spark.implicits._

  override def afterAll(): Unit = prior.foreach { p =>
    SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p)
  }

  test("scratch path resolves STRING delete keys (catalyst UTF8String round-trip)") {
    // forced scratch (maxRows=0) with a string key: the executor-loaded
    // map stores values read back from the scratch parquet, which must
    // hash/equal the reader-side probe keys (UTF8String, not String) —
    // a representation mismatch would silently drop zero deletes
    GraftCatalog.register(spark, wh)
    val dir = s"$wh/db/strkey"
    val t = GraftTable.create(spark, dir, StructType(Seq(
      StructField("k", StringType), StructField("v", LongType))),
      key = Seq("k"), formatVersion = 2)
    t.append(spark.range(100).selectExpr("concat('k', id) AS k", "id AS v"))
    t.rowDelta(
      spark.range(40).selectExpr("concat('k', id) AS k"),
      spark.range(2).selectExpr("concat('k', id) AS k", "id + 1000 AS v"),
      Seq("k"))
    spark.conf.set("graft.delete.broadcastMaxRows", "0")
    try {
      val rows = spark.sql("SELECT k, v, _file FROM graft.db.strkey").collect()
      assert(rows.length == 100 - 40 + 2, s"got ${rows.length}")
      val upserted = rows.filter(_.getLong(1) >= 1000).map(_.getString(0)).sorted
      assert(upserted.toSeq == Seq("k0", "k1"))
    } finally spark.conf.unset("graft.delete.broadcastMaxRows")
  }

  // one warehouse for the suite: Spark caches catalog instances by name,
  // so a second register() with a different warehouse would not take
  private lazy val wh =
    java.nio.file.Files.createTempDirectory("graft_bigdel").toString

  test("a scan over >1M pending equality-delete keys succeeds without compact()") {
    GraftCatalog.register(spark, wh)
    val dir = s"$wh/db/big"
    val t = GraftTable.create(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))),
      key = Seq("id"), formatVersion = 2)
    val n = 1200000L
    t.append(spark.range(n).selectExpr("id", "concat('v', id) AS v"))
    // delete 1.1M keys, upsert 10 fresh rows — well past the 1M default
    val delN = 1100000L
    t.rowDelta(
      spark.range(delN).toDF("id"),
      spark.range(10).selectExpr("id", "'upd' AS v"),
      Seq("id"))
    // _file in the CONSUMED output forces the DSv2 flat scan's
    // delete-aware reader (a bare count() would prune _file away and fall
    // back to the view path, never exercising it): rows must flow through
    // the scratch-merge path, not a driver collect
    val rows = spark.sql("SELECT id, _file FROM graft.db.big").collect()
    assert(rows.length == (n - delN + 10).toInt)
    assert(rows.forall(r => r.getString(1) != null && r.getString(1).nonEmpty))
    // the 10 upserted rows survive their own delete (same-commit rows are
    // newer than the delete version); everything else below delN is gone
    assert(rows.count(_.getLong(0) < delN) == 10)
    // the scratch merge really happened (executor-load path, not collect)
    val scratch = new java.io.File(s"$dir/_graft_log/scratch")
    assert(scratch.isDirectory && scratch.listFiles().nonEmpty,
      "expected a merged-delete scratch dir for an over-threshold delete set")
  }
}
