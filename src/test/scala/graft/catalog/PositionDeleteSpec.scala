package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable

/** Position deletes (Iceberg format-v2's second delete form): rows are
  * deleted by their `(_file, _pos)` physical identity instead of a key
  * column. Applied reader-side through the same version-guarded delete
  * filter as equality deletes; coexists with a pending equality group.
  * (Reference scope: the reference demos equality deletes only —
  * `IcebergJavaApiUpsert.java` — this is extension surface.) */
class PositionDeleteSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    val wh = java.nio.file.Files.createTempDirectory("graft_posdel_wh").toString
    GraftCatalog.register(spark, wh)
    wh
  }

  private def mkTable(name: String, key: Seq[String] = Nil): GraftTable = {
    val t = GraftTable.create(spark, s"$warehouse/db/$name", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))),
      key = key, formatVersion = 2)
    t.append((0L until 10L).map(i => (i, s"a$i")).toDF("id", "v").repartition(1))
    t.append((10L until 20L).map(i => (i, s"b$i")).toDF("id", "v").repartition(1))
    t
  }

  test("deleteWherePositional removes exactly the matching rows, all read paths agree") {
    warehouse
    val t = mkTable("pd1")
    t.deleteWherePositional(col("id") % 3 === 0)
    val expect = (0L until 20L).filter(_ % 3 != 0).toSet
    assert(t.toDF.select("id").as[Long].collect().toSet == expect)
    assert(spark.read.format("graft").load(t.dir)
      .select("id").as[Long].collect().toSet == expect)
    assert(spark.sql(s"SELECT id FROM graft.db.pd1").as[Long].collect().toSet == expect)
    // the delete landed as a position-delete file, no data rewritten
    assert(t.snapshot.deletes.nonEmpty)
    assert(t.snapshot.deletes.forall(_.keys == GraftTable.PosDeleteKeys))
  }

  test("positionDelete canonicalizes path spellings (bare, file:/, file:///)") {
    warehouse
    val t = mkTable("pd2")
    val ids = spark.read.format("graft").option("keepScan", "true").load(t.dir)
      .select(col("id"), col("_file"), col("_pos"))
      .filter(col("id").isin(1L, 12L)).collect()
    assert(ids.length == 2)
    val stamped = ids.map(r => (r.getString(1), r.getLong(2)))
    // respell each stamped path differently; both must still match
    val respelled = Seq(
      (stamped(0)._1.replaceFirst("^file:", ""), stamped(0)._2),          // bare /x
      (stamped(1)._1.replaceFirst("^file:/", "file:///"), stamped(1)._2)) // file:///x
    t.positionDelete(respelled.toDF("_file", "_pos"))
    val left = t.toDF.select("id").as[Long].collect().toSet
    assert(left == (0L until 20L).toSet -- Set(1L, 12L))
  }

  test("sequence semantics: rows appended after the delete survive it") {
    warehouse
    val t = mkTable("pd3")
    t.deleteWherePositional(col("id") < 5)
    t.append((100L until 103L).map(i => (i, s"c$i")).toDF("id", "v").repartition(1))
    val got = t.toDF.select("id").as[Long].collect().toSet
    assert(got == ((5L until 20L) ++ (100L until 103L)).toSet)
  }

  test("position deletes coexist with a pending equality-delete group") {
    warehouse
    val t = mkTable("pd4", key = Seq("id"))
    // equality-keyed upsert: replaces id=7, deletes nothing else
    t.rowDelta((7L to 7L).toDF("id"), Seq((7L, "UP")).toDF("id", "v"), Seq("id"))
    // then a positional delete of id=11's current row
    t.deleteWherePositional(col("id") === 11L)
    val rows = t.toDF.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!rows.contains(11L), "positional delete applied")
    assert(rows(7L) == "UP", "equality upsert applied")
    assert(rows.size == 19)
    val kinds = t.snapshot.deletes.map(_.keys).distinct
    assert(kinds.toSet == Set(Seq("id"), GraftTable.PosDeleteKeys))
    // SQL readback still works (DSv2 scan route)
    assert(spark.sql("SELECT count(*) FROM graft.db.pd4").as[Long].head == 19L)
  }

  test("compact resolves position deletes and clears them") {
    warehouse
    val t = mkTable("pd5")
    t.deleteWherePositional(col("id") >= 15)
    t.compact()
    assert(t.snapshot.deletes.isEmpty)
    assert(t.toDF.select("id").as[Long].collect().toSet == (0L until 15L).toSet)
  }

  test("changelog across a position delete emits its pre-image rows") {
    warehouse
    val t = mkTable("pd6")
    val v0 = t.snapshot.version
    t.deleteWherePositional(col("id").isin(2L, 13L))
    val changes = t.changesBetween(v0, t.snapshot.version)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(changes.toSet == Set((2L, "delete"), (13L, "delete")))
  }

  test("guards: format v1 and shadowed meta columns are rejected; concurrent advance aborts") {
    warehouse
    val v1t = GraftTable.create(spark, s"$warehouse/db/pd7", StructType(Seq(
      StructField("id", LongType))))
    v1t.append(Seq(1L).toDF("id"))
    val e1 = intercept[IllegalArgumentException] {
      v1t.positionDelete(Seq(("x", 0L)).toDF("_file", "_pos"))
    }
    assert(e1.getMessage.contains("format version"))
    val sh = GraftTable.create(spark, s"$warehouse/db/pd8", StructType(Seq(
      StructField("id", LongType), StructField("_pos", LongType))),
      formatVersion = 2)
    val e2 = intercept[IllegalArgumentException] {
      sh.positionDelete(Seq(("x", 0L)).toDF("_file", "_pos"))
    }
    assert(e2.getMessage.contains("shadow"))
  }
}
