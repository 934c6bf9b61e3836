package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.{GraftCatalog, GraftSparkSessionExtensions}
import graft.table.{GraftTable, PartitionField}

/** The catalog read path: plain spark.sql against graft.<ns>.<table>
  * through the session-extensions resolution rule (+ ViewCatalog for
  * SHOW VIEWS metadata), on a session built with the graft extensions. */
class GraftCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    GraftCatalog.register(spark, wh)
    wh
  }

  def mkTable(ns: String, name: String, schema: StructType): GraftTable =
    GraftTable.create(spark, s"$warehouse/$ns/$name", schema)

  test("SELECT through the catalog: basic table") {
    val t = mkTable("db", "people", StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))))
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"))
    val got = spark.sql("SELECT name FROM graft.db.people WHERE id >= 2 ORDER BY id")
      .as[String].collect().toSeq
    assert(got == Seq("b", "c"))
  }

  test("catalog view reflects evolution: old dirs project NULL for new columns") {
    val t = mkTable("db", "evolving", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    t.append(Seq((1L, "x")).toDF("id", "v"))
    t.addColumn("extra", StringType)
    t.append(Seq((2L, "y", "e2")).toDF("id", "v", "extra"))
    val got = spark.sql("SELECT id, extra FROM graft.db.evolving ORDER BY id").collect()
    assert(got(0).isNullAt(1) && got(1).getString(1) == "e2")
  }

  test("catalog view applies version-guarded equality deletes") {
    val t = mkTable("db", "upserted", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    t.append(Seq((1L, "v1"), (2L, "v1")).toDF("id", "v"))
    t.upgradeFormat(2)
    t.rowDelta(Seq(1L).toDF("id"), Seq((1L, "v2")).toDF("id", "v"), Seq("id"))
    val got = spark.sql("SELECT id, v FROM graft.db.upserted ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "v2"), (2L, "v1")))
  }

  test("catalog sees fresh state after DML (no caching)") {
    val t = mkTable("db", "live", StructType(Seq(StructField("id", LongType))))
    t.append(Seq(1L, 2L).toDF("id"))
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.live").as[Long].head() == 2)
    t.append(Seq(3L).toDF("id"))
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.live").as[Long].head() == 3)
    t.delete(col("id") === 1L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.live").as[Long].head() == 2)
  }

  test("partitioned tables read through the catalog") {
    val t = GraftTable.create(spark, s"$warehouse/db/parts", StructType(Seq(
      StructField("id", LongType), StructField("d", DateType))),
      spec = Seq(PartitionField("d", "month")))
    t.append(Seq((1L, "2020-01-15"), (2L, "2020-02-15")).toDF("id", "ds")
      .select(col("id"), to_date(col("ds")).as("d")))
    val got = spark.sql(
      "SELECT id FROM graft.db.parts WHERE d = DATE'2020-02-15'").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  test("listViews metadata and joins across catalog tables") {
    mkTable("db2", "t1", StructType(Seq(StructField("id", LongType))))
      .append(Seq(1L, 2L).toDF("id"))
    mkTable("db2", "t2", StructType(Seq(StructField("id", LongType))))
      .append(Seq(2L, 3L).toDF("id"))
    // vanilla Spark doesn't route SHOW VIEWS to v2 catalogs; the catalog
    // metadata API is the surface
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.ViewCatalog]
    val views = cat.listViews("db2").map(_.name()).toSet
    assert(views == Set("t1", "t2"))
    val joined = spark.sql(
      "SELECT a.id FROM graft.db2.t1 a JOIN graft.db2.t2 b ON a.id = b.id")
      .as[Long].collect().toSeq
    assert(joined == Seq(2L))
  }

  test("GraftSql DML against catalog names with no register() step") {
    val t = mkTable("db3", "accounts", StructType(Seq(
      StructField("id", LongType), StructField("balance", DoubleType))))
    t.append(Seq((1L, 100.0), (2L, 200.0)).toDF("id", "balance"))
    val g = graft.sql.GraftSql(spark)
    g.sql("UPDATE graft.db3.accounts SET balance = balance + 50 WHERE id = 1")
    g.sql(
      """MERGE INTO graft.db3.accounts t
        |USING (SELECT 3 AS id, 300.0 AS balance) s
        |ON s.id = t.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.sql("SELECT id, balance FROM graft.db3.accounts ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 150.0), (2L, 200.0), (3L, 300.0)))
  }

  test("missing table raises a clear error") {
    warehouse // force catalog registration
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.db.nope").collect()
    }
    assert(e.getMessage.toLowerCase.contains("nope") ||
      e.getMessage.toLowerCase.contains("cannot be found"))
  }
}
