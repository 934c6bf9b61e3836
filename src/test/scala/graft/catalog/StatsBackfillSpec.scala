package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.table.{GraftTable, PartitionField}

/** CALL graft.system.capture_stats — the ANALYZE-style backfill: dirs
  * written before stats were configured (or registered via add_files)
  * have no fold sidecars, so the metadata-only aggregate folds decline;
  * capture_stats builds the missing sidecars (bounds+nn, pstats,
  * pcolstats) without touching committed data, after which the same
  * queries fold. Existing sidecars are never overwritten; a second run
  * is a no-op. */
class StatsBackfillSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_sb_wh").toString
    GraftCatalog.register(spark, wh)
    wh
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("g", StringType)))

  private def folded(sql: String): Boolean =
    spark.sql(sql).queryExecution.analyzed.collectLeaves()
      .forall(_.isInstanceOf[LocalRelation])

  test("backfill enables the partition-scoped and global folds on old dirs") {
    val t = GraftTable.create(spark, s"$warehouse/db/b1", schema,
      spec = Seq(PartitionField("g", "identity")))
    t.append(Seq((5L, "a"), (2L, "b")).toDF("id", "g"))   // pre-stats dirs:
    t.append(Seq((9L, "a"), (7L, "c")).toDF("id", "g"))   // no bounds/pcolstats
    t.setStatsKeys(Seq("id"))
    val gq = "SELECT g, min(id) AS lo, max(id) AS hi, count(id) AS n " +
      "FROM graft.db.b1 GROUP BY g"
    val mq = "SELECT min(id) AS lo, max(id) AS hi FROM graft.db.b1"
    assert(!folded(gq) && !folded(mq)) // sidecars missing: scan
    val written = GraftTable.load(spark, s"$warehouse/db/b1").captureStats()
    assert(written.count(_.startsWith("stats/")) == 2 &&
      written.count(_.startsWith("pcolstats/")) == 2, written.toString)
    assert(folded(gq), spark.sql(gq).queryExecution.analyzed.toString)
    assert(folded(mq))
    val got = spark.sql(gq).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(("a", 5L, 9L, 2L), ("b", 2L, 2L, 1L), ("c", 7L, 7L, 1L)))
    assert(spark.sql(mq).as[(Long, Long)].head() == ((2L, 9L)))
    // idempotent: nothing left to build
    assert(GraftTable.load(spark, s"$warehouse/db/b1").captureStats().isEmpty)
  }

  test("CALL capture_stats backfills an add_files-registered dir") {
    val t = GraftTable.create(spark, s"$warehouse/db/b2", schema,
      statsKeys = Seq("id"))
    t.append(Seq((3L, "x")).toDF("id", "g"))
    val ext = java.nio.file.Files.createTempDirectory("graft_sb_ext")
      .toString + "/batch"
    Seq((8L, "y"), (1L, "z")).toDF("id", "g").write.parquet(ext)
    spark.sql(s"CALL graft.system.add_files('db.b2', '$ext')")
    val mq = "SELECT min(id) AS lo, max(id) AS hi FROM graft.db.b2"
    assert(!folded(mq)) // the registered dir has no bounds sidecar
    spark.sql("CALL graft.system.capture_stats('db.b2')").collect()
    assert(folded(mq))
    assert(spark.sql(mq).as[(Long, Long)].head() == ((1L, 8L)))
  }

  test("ANALYZE TABLE ... COMPUTE STATISTICS is the SQL-facing backfill") {
    val t = GraftTable.create(spark, s"$warehouse/db/b4", schema,
      spec = Seq(PartitionField("g", "identity")))
    t.append(Seq((4L, "x"), (6L, "y")).toDF("id", "g"))
    t.setStatsKeys(Seq("id"))
    val mq = "SELECT g, max(id) AS hi FROM graft.db.b4 GROUP BY g"
    assert(!folded(mq))
    new graft.sql.GraftSql(spark)
      .sql("ANALYZE TABLE graft.db.b4 COMPUTE STATISTICS")
    assert(folded(mq))
    assert(spark.sql(mq).as[(String, Long)].collect().toSet ==
      Set(("x", 4L), ("y", 6L)))
  }

  test("a deleted pstats sidecar (legacy dir) is rebuilt") {
    val t = GraftTable.create(spark, s"$warehouse/db/b3", schema,
      spec = Seq(PartitionField("g", "identity")))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "g"))
    val log = new java.io.File(s"$warehouse/db/b3/_graft_log/pstats")
    // the real sidecar, not Hadoop's hidden .crc sibling
    val side = log.listFiles().filter(_.getName.endsWith(".json")).head
    assert(side.delete())
    val cq = "SELECT g, count(*) AS n FROM graft.db.b3 GROUP BY g"
    assert(!folded(cq))
    val written = GraftTable.load(spark, s"$warehouse/db/b3").captureStats()
    assert(written.exists(_.startsWith("pstats/")), written.toString)
    assert(folded(cq))
    assert(spark.sql(cq).as[(String, Long)].collect().toMap ==
      Map("a" -> 1L, "b" -> 1L))
  }
}
