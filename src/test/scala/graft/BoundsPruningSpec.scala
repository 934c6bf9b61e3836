package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable

/** Per-dir [min, max] bounds sidecars (`setStatsKeys`): range predicates
  * on NON-layout columns skip whole data dirs whose interval cannot
  * match — the role Iceberg's manifest column bounds play. Soundness
  * invariants: pre-stats dirs are never skipped; all-NULL columns record
  * no bounds; skipping never changes results. */
class BoundsPruningSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  import spark.implicits._

  override def afterAll(): Unit = { /* shared session */ }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_bounds_$tag").toString + "/t"

  /** Three appends with disjoint long ranges; returns table. */
  private def mkRanged(): GraftTable = {
    val t = GraftTable.create(spark, tmp("long"),
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))))
    t.setStatsKeys(Seq("id"))
    t.append((0L until 100L).map(i => (i, s"a$i")).toDF("id", "v"))
    t.append((100L until 200L).map(i => (i, s"b$i")).toDF("id", "v"))
    t.append((200L until 300L).map(i => (i, s"c$i")).toDF("id", "v"))
    t
  }

  test("range predicate reads only the dirs whose bounds intersect") {
    val t = mkRanged()
    val hit = t.scan(col("id") >= 250L)
    assert(hit.count() == 50L)
    // only the third dir's files are listed — two dirs skipped at the
    // driver before any file I/O
    val dirs = hit.inputFiles.map(f => f.split("/data/")(1).split("/")(0)).toSet
    assert(dirs.size == 1, s"expected 1 live dir, read $dirs")

    val mid = t.scan(col("id") === 150L)
    assert(mid.count() == 1L)
    assert(mid.inputFiles.map(_.split("/data/")(1).split("/")(0)).toSet.size == 1)

    val none = t.scan(col("id") > 1000L)
    assert(none.count() == 0L)
    assert(none.inputFiles.isEmpty)
  }

  test("skipping never changes results (vs unpruned filter)") {
    val t = mkRanged()
    val preds = Seq(col("id") < 100L, col("id") >= 100L && col("id") < 150L,
      col("id").isin(5L, 150L, 299L), lit(50L) <= col("id"))
    preds.foreach { p =>
      val a = t.scan(p).orderBy("id").collect().toSeq
      val b = t.toDF.filter(p).orderBy("id").collect().toSeq
      assert(a == b, s"pruned scan diverged for $p")
    }
  }

  test("pre-stats dirs have no sidecar and are never skipped") {
    val t = GraftTable.create(spark, tmp("pre"),
      StructType(Seq(StructField("id", LongType))))
    t.append((0L until 10L).map(Tuple1(_)).toDF("id")) // before setStatsKeys
    t.setStatsKeys(Seq("id"))
    t.append((100L until 110L).map(Tuple1(_)).toDF("id"))
    // predicate excludes the stats dir but must keep the pre-stats dir
    assert(t.scan(col("id") < 50L).count() == 10L)
    assert(t.scan(col("id") >= 100L).count() == 10L)
  }

  test("date and string bounds prune; all-NULL column records no bounds") {
    val t = GraftTable.create(spark, tmp("mixed"),
      StructType(Seq(StructField("d", DateType), StructField("s", StringType),
        StructField("n", LongType))))
    t.setStatsKeys(Seq("d", "s", "n"))
    def day(x: String) = java.sql.Date.valueOf(x)
    t.append(Seq((day("2020-01-01"), "apple", null.asInstanceOf[java.lang.Long]),
      (day("2020-01-31"), "banana", null.asInstanceOf[java.lang.Long]))
      .toDF("d", "s", "n"))
    t.append(Seq((day("2021-06-01"), "melon", java.lang.Long.valueOf(7L)),
      (day("2021-06-30"), "peach", java.lang.Long.valueOf(9L))).toDF("d", "s", "n"))
    val d1 = t.scan(col("d") >= lit(day("2021-01-01")))
    assert(d1.count() == 2L)
    assert(d1.inputFiles.map(_.split("/data/")(1).split("/")(0)).toSet.size == 1)
    val s1 = t.scan(col("s") < "b")
    assert(s1.count() == 1L)
    assert(s1.inputFiles.map(_.split("/data/")(1).split("/")(0)).toSet.size == 1)
    // first dir's n is all NULL -> no bounds entry -> kept (sound), and
    // the filter still evaluates correctly
    assert(t.scan(col("n") === 7L).count() == 1L)
  }

  test("NaN bounds never crash or skip (non-finite doubles keep the dir)") {
    val t = GraftTable.create(spark, tmp("nan"),
      StructType(Seq(StructField("x", DoubleType), StructField("id", LongType))))
    t.setStatsKeys(Seq("x"))
    t.append(Seq((1.0, 1L), (Double.NaN, 2L)).toDF("x", "id")) // max(x) = NaN
    t.append(Seq((100.0, 3L)).toDF("x", "id"))
    // predicate comparisons against a NaN bound must keep the dir; the
    // row filter then evaluates with Spark's NaN ordering (NaN is the
    // GREATEST double in Spark SQL, so NaN > 50.0 is true)
    val got = t.scan(col("x") > 50.0).select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 3L))
    assert(t.scan(col("x") <= 1.0).select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("mismatched literal types never skip (timestamp literal vs date bounds)") {
    val t = GraftTable.create(spark, tmp("xtype"),
      StructType(Seq(StructField("d", DateType), StructField("id", LongType))))
    t.setStatsKeys(Seq("d"))
    def dt(s: String) = java.sql.Date.valueOf(s)
    t.append(Seq((dt("2020-01-01"), 1L), (dt("2020-06-01"), 2L)).toDF("d", "id"))
    t.append(Seq((dt("2021-01-01"), 3L)).toDF("d", "id"))
    // a TIMESTAMP literal against the DATE column: epoch-micros vs
    // epoch-days must not be compared — the scan keeps all dirs and the
    // row filter stays exact
    val ts = java.sql.Timestamp.valueOf("2020-12-01 00:00:00")
    val got = t.scan(col("d") >= lit(ts)).select("id").as[Long].collect().toSeq
    assert(got == Seq(3L))
  }

  test("bounds survive a column rename (sidecars keyed by physical name)") {
    val t = mkRanged()
    t.renameColumn("id", "doc_id")
    val hit = t.scan(col("doc_id") >= 250L)
    assert(hit.count() == 50L)
    assert(hit.inputFiles.map(_.split("/data/")(1).split("/")(0)).toSet.size == 1)
  }

  test("vacuum sweeps sidecars of unreferenced dirs, keeps live ones") {
    val t = mkRanged()
    // overwrite drops the three original dirs from the current snapshot
    t.toDF.count()
    t.delete(col("id") >= 0L) // full rewrite -> old dirs unreferenced by head
    t.append((0L until 10L).map(i => (i, s"z$i")).toDF("id", "v"))
    t.expireSnapshots(keepLast = 1)
    val statsDir = new java.io.File(s"${t.dir}/_graft_log/stats")
    val before = statsDir.listFiles().length
    val swept = t.vacuumOrphans(olderThanMs = -1000) // everything is "old"
    val after = statsDir.listFiles().length
    assert(swept.exists(_.contains("_graft_log/stats/")), s"no sidecars swept: $swept")
    assert(after < before)
    // the live dir's sidecar survives and still prunes
    val live = t.scan(col("id") >= 5L)
    assert(live.count() == 5L)
  }

  test("bounds compose with partition-transform pruning") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
    val t = GraftTable.create(spark, tmp("compose"), o.schema,
      spec = Seq(graft.table.PartitionField("o_orderdate", "month")))
    t.setStatsKeys(Seq("o_totalprice"))
    t.append(o)
    val top = o.agg(max("o_totalprice")).head.getDouble(0)
    val pred = col("o_totalprice") > lit(top + 1.0)
    assert(t.scan(pred).count() == 0L)
    assert(t.scan(pred).inputFiles.isEmpty) // bounds alone kill the scan
  }
}
