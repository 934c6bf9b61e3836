package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable

/** `_pos` metadata column: each row's ordinal within its data file —
  * (_file, _pos) is a stable physical row identity (Iceberg's reserved
  * metadata columns). Stamped by the DSv2 reader, never read from the
  * file; shadowed independently by a data column of the same name. */
class PosMetaColSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    val wh = java.nio.file.Files.createTempDirectory("graft_pos_wh").toString
    GraftCatalog.register(spark, wh)
    wh
  }

  test("(_file, _pos) is unique and positions are dense per file") {
    warehouse
    val t = GraftTable.create(spark, s"$warehouse/db/p1", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    t.append((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"))
    t.append((101L to 150L).map(i => (i, s"v$i")).toDF("id", "v"))
    val rows = spark.sql("SELECT id, _file, _pos FROM graft.db.p1")
      .as[(Long, String, Long)].collect()
    assert(rows.length == 150)
    // identity is unique
    assert(rows.map(r => (r._2, r._3)).toSet.size == 150)
    // dense 0..n-1 within each file
    rows.groupBy(_._2).foreach { case (f, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length).toSeq, s"gap in $f")
    }
  }

  test("_pos works alone, in any projection order, and under filters") {
    warehouse
    val t = GraftTable.create(spark, s"$warehouse/db/p2", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    t.append((1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    val alone = spark.sql("SELECT _pos FROM graft.db.p2").as[Long].collect()
    assert(alone.length == 20)
    // meta col FIRST in the projection (exercises the ordinal remap)
    val first = spark.sql("SELECT _pos, id, _file FROM graft.db.p2 WHERE id <= 5")
      .as[(Long, Long, String)].collect()
    assert(first.length == 5)
    assert(first.map(_._2).toSet == (1L to 5L).toSet)
  }

  test("_pos stays the true file ordinal under a pushed filter that skips row groups") {
    warehouse
    // write an id-SORTED file (sort key) with MANY row groups: tiny parquet
    // block size makes the writer roll a new row group every ~100 rows, and
    // sorted data gives each group a tight id range — so a selective tail
    // predicate lets parquet drop every leading row group. Counting rows
    // off a filter-pushing reader would then stamp positions restarting at
    // the first surviving group (0, 1, 2, …) instead of true file ordinals.
    val hc = spark.sparkContext.hadoopConfiguration
    val priorBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 1024)
    try {
      val t = GraftTable.create(spark, s"$warehouse/db/p5", StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))), key = Seq("id"))
      t.append((0L until 5000L).map(i => (i, s"v$i")).toDF("id", "v"))
    } finally {
      if (priorBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", priorBlock)
    }
    // ground truth: the UNFILTERED read emits every row, so its stamped
    // ordinals are the rows' true positions within their file
    val truth = spark.sql("SELECT id, _file, _pos FROM graft.db.p5")
      .as[(Long, String, Long)].collect()
    assert(truth.length == 5000)
    // sanity: the file holding the tail really has >1 row group
    val tailFile = truth.find(_._1 == 4999L).get._2.replaceFirst("^file:", "")
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      hc, new org.apache.hadoop.fs.Path(tailFile))
    assert(footer.getBlocks.size() > 1, "test needs a multi-row-group file")
    val byId = truth.map(r => r._1 -> (r._2, r._3)).toMap
    val got = spark.sql("SELECT id, _file, _pos FROM graft.db.p5 WHERE id >= 4900")
      .as[(Long, String, Long)].collect()
    assert(got.length == 100)
    got.foreach { case (id, f, pos) =>
      assert(byId(id) == ((f, pos)),
        s"(_file,_pos)=($f,$pos) for id=$id but unfiltered read says ${byId(id)} " +
          "— positions shifted by row-group skipping")
    }
  }

  test("a data column named _pos shadows the metadata column") {
    warehouse
    val t = GraftTable.create(spark, s"$warehouse/db/p3", StructType(Seq(
      StructField("id", LongType), StructField("_pos", LongType))))
    t.append(Seq((1L, 777L)).toDF("id", "_pos"))
    val got = spark.sql("SELECT _pos FROM graft.db.p3").as[Long].collect()
    assert(got.toSeq == Seq(777L))
  }

  test("_pos on a MoR table reflects live rows' file positions") {
    warehouse
    val t = GraftTable.create(spark, s"$warehouse/db/p4", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))),
      key = Seq("id"), formatVersion = 2)
    t.append((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    t.rowDelta(Seq(3L).toDF("id"), Seq((3L, "v3b")).toDF("id", "v"), Seq("id"))
    val rows = spark.sql("SELECT id, v, _pos FROM graft.db.p4")
      .as[(Long, String, Long)].collect()
    assert(rows.length == 10)
    assert(rows.find(_._1 == 3L).get._2 == "v3b")
  }
}
