package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.table.{GraftTable, PartitionField}

/** Runtime group filtering for group-based (copy-on-write) row-level SQL:
  * Spark's RowLevelOperationRuntimeGroupFiltering computes the DISTINCT
  * `_file` of condition-matching rows and pushes it into the operation's
  * scan ([[GraftFlatBatchScan.filter]]), which keeps only the data dirs
  * containing matched files; the ReplaceData commit then swaps exactly
  * those dirs ([[graft.table.GraftTable.commitReplaceDirs]]). At 100 TB
  * this is the difference between a SQL UPDATE rewriting the table and
  * rewriting the one dir with matched rows. */
class RuntimeGroupFilterSpec extends AnyFunSuite with BeforeAndAfterAll {

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
      .config("spark.sql.session.timeZone", "UTC")
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
    val wh = java.nio.file.Files.createTempDirectory("graft_rgf_wh").toString
    GraftCatalog.register(spark, wh)
    wh
  }

  private val idv = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  /** Three appends → three data dirs, each holding distinct ids. */
  private def threeDirTable(name: String): GraftTable = {
    val t = GraftTable.create(spark, s"$warehouse/db/$name", idv)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.append(Seq((10L, "c"), (11L, "d")).toDF("id", "v"))
    t.append(Seq((20L, "e"), (21L, "f")).toDF("id", "v"))
    t
  }

  private def dirs(name: String): Seq[(String, Int)] =
    GraftTable.load(spark, s"$warehouse/db/$name").snapshot.dataDirs
      .map(d => (d.path, d.version))

  test("SQL UPDATE rewrites only the dirs containing matched rows") {
    threeDirTable("u")
    val before = dirs("u")
    spark.sql("UPDATE graft.db.u SET v = 'ZZ' WHERE id = 10")
    val after = dirs("u")
    // the two untouched dirs survive verbatim (same path AND version)
    assert(after.count(before.contains) == 2)
    assert(after.size == 3)
    val got = spark.sql("SELECT id, v FROM graft.db.u ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (10L, "ZZ"), (11L, "d"),
      (20L, "e"), (21L, "f")))
  }

  test("SQL MERGE rewrites only matched dirs; inserts land in the new dir") {
    threeDirTable("m")
    val before = dirs("m")
    Seq((10L, "M"), (99L, "NEW")).toDF("id", "v").createOrReplaceTempView("rgf_src")
    spark.sql("""MERGE INTO graft.db.m t USING rgf_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET v = s.v
                 WHEN NOT MATCHED THEN INSERT *""")
    val after = dirs("m")
    assert(after.count(before.contains) == 2)
    val got = spark.sql("SELECT id, v FROM graft.db.m ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (10L, "M"), (11L, "d"),
      (20L, "e"), (21L, "f"), (99L, "NEW")))
  }

  test("subquery DELETE drops the matched dir, keeps the rest verbatim") {
    threeDirTable("d")
    val before = dirs("d")
    Seq(10L, 11L).toDF("id").createOrReplaceTempView("rgf_del")
    spark.sql("DELETE FROM graft.db.d WHERE id IN (SELECT id FROM rgf_del)")
    val after = dirs("d")
    // whole middle dir deleted → zero replacement rows → no new dir
    assert(after.size == 2)
    assert(after.forall(before.contains))
    assert(spark.sql("SELECT id FROM graft.db.d ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L, 20L, 21L))
  }

  test("UPDATE matching nothing leaves every dir untouched") {
    threeDirTable("n")
    val before = dirs("n")
    // subquery keeps it off the metadata-delete path and the condition
    // non-static, so runtime filtering decides
    Seq(12345L).toDF("id").createOrReplaceTempView("rgf_none")
    spark.sql("UPDATE graft.db.n SET v = 'x' WHERE id IN (SELECT id FROM rgf_none)")
    val after = dirs("n")
    assert(after == before ||
      (after.count(before.contains) == before.size)) // no dir replaced
    assert(spark.sql("SELECT count(*) FROM graft.db.n").as[Long].head() == 6L)
  }

  test("partitioned table: partial replace re-clusters only matched dirs") {
    val t = GraftTable.create(spark, s"$warehouse/db/p", idv,
      spec = Seq(PartitionField("v", "identity")))
    t.append(Seq((1L, "x"), (2L, "y")).toDF("id", "v"))
    t.append(Seq((10L, "x"), (11L, "y")).toDF("id", "v"))
    val before = dirs("p")
    spark.sql("UPDATE graft.db.p SET v = 'z' WHERE id = 10")
    val after = dirs("p")
    assert(after.count(before.contains) == 1) // dir 1 untouched
    val got = spark.sql("SELECT id, v FROM graft.db.p ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "x"), (2L, "y"), (10L, "z"), (11L, "y")))
  }

  test("a data column named _file shadows the metadata column everywhere") {
    val dir = s"$warehouse/db/shadow"
    val t = GraftTable.create(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("_file", StringType))))
    t.append(Seq((1L, "keep-me"), (2L, "also-keep")).toDF("id", "_file"))
    // reads serve the DATA values, not stamped paths
    assert(spark.sql("SELECT _file FROM graft.db.shadow ORDER BY id")
      .as[String].collect().toSeq == Seq("keep-me", "also-keep"))
    // a row-level UPDATE must not clobber the column with file paths
    spark.sql("UPDATE graft.db.shadow SET id = 99 WHERE id = 1")
    val after = spark.sql("SELECT id, _file FROM graft.db.shadow ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(after == Seq((2L, "also-keep"), (99L, "keep-me")))
  }

  test("_file metadata column: queryable, one value per data dir") {
    threeDirTable("f")
    val n = spark.sql("SELECT count(distinct _file) AS n FROM graft.db.f")
      .as[Long].head()
    assert(n == 3L)
    // rows of one dir share their file; files live under the table dir
    val rows = spark.sql("SELECT _file, id FROM graft.db.f ORDER BY id")
      .as[(String, Long)].collect()
    assert(rows.length == 6)
    assert(rows.forall(_._1.contains("/db/f/data/")))
    assert(rows.find(_._2 == 1L).get._1 == rows.find(_._2 == 2L).get._1)
  }
}
