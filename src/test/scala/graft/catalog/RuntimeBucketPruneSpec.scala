package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Expressions}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.SupportsReportPartitioning
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.table.{GraftTable, PartitionField}

/** Runtime bucket pruning on the storage-partitioned-join scan: a join
  * against a filtered dim pushes the IN-set of join keys into
  * [[GraftBucketedScan.filter]] at runtime; hashing them keeps only the
  * buckets that can match, while every partition VALUE survives (empty
  * file list) so the KeyGroupedPartitioning contract holds. */
class RuntimeBucketPruneSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def mkBucketed(n: Int): GraftTable = {
    val wh = java.nio.file.Files.createTempDirectory("graft_rbp").toString
    val t = GraftTable.create(spark, s"$wh/t",
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
      spec = Seq(PartitionField("k", "bucket", n)))
    t.append((1L to 64L).map(i => (i, s"v$i")).toDF("k", "v"))
    t
  }

  test("IN runtime filter keeps partition values but empties excluded buckets") {
    val t = mkBucketed(8)
    val scan = new GraftBucketedScan(t, t.snapshot,
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
      Array.empty)
    val all = scan.planInputPartitions()
    assert(all.length == 8)
    val keyVals = Array[Long](1L, 2L)
    val expectBuckets = keyVals.flatMap(v =>
      GraftBucketedScan.bucketOf(v, LongType, 8)).toSet
    val in = new Predicate("IN",
      (Expressions.column("k").asInstanceOf[V2Expression] +:
        keyVals.map(v => Expressions.literal(v).asInstanceOf[V2Expression])).toArray)
    scan.filter(Array(in))
    val pruned = scan.planInputPartitions()
    // partition-value set preserved (SPJ contract)...
    assert(pruned.length == all.length)
    // ...but only matching buckets keep files
    val withFiles = pruned.collect { case p: GraftBucketPartition if p.files.nonEmpty => p.bucket }
    assert(withFiles.toSet == expectBuckets)
    assert(withFiles.length < all.length)
  }

  test("unparseable runtime predicate prunes nothing (sound)") {
    val t = mkBucketed(4)
    val scan = new GraftBucketedScan(t, t.snapshot,
      StructType(Seq(StructField("k", LongType))), Array.empty)
    val weird = new Predicate("=",
      Array[V2Expression](Expressions.column("k"), Expressions.literal(1L)))
    scan.filter(Array(weird))
    assert(scan.planInputPartitions()
      .collect { case p: GraftBucketPartition if p.files.nonEmpty => p }.length == 4)
  }

  test("filterAttributes only advertised when the source column is read") {
    val t = mkBucketed(4)
    val withK = new GraftBucketedScan(t, t.snapshot,
      StructType(Seq(StructField("k", LongType))), Array.empty)
    assert(withK.filterAttributes().map(_.describe()).toSeq == Seq("k"))
    val withoutK = new GraftBucketedScan(t, t.snapshot,
      StructType(Seq(StructField("v", StringType))), Array.empty)
    assert(withoutK.filterAttributes().isEmpty)
  }

  test("joined against a filtered dim: results stay correct under pruning") {
    val wh = java.nio.file.Files.createTempDirectory("graft_rbp_e2e").toString
    val cat = s"graftrb${java.util.UUID.randomUUID().toString.take(8)}"
    GraftCatalog.register(spark, wh, cat)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val t = GraftTable.create(spark, s"$wh/db/fact",
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
      spec = Seq(PartitionField("k", "bucket", 8)))
    t.append((1L to 64L).map(i => (i, s"v$i")).toDF("k", "v"))
    Seq(3L, 7L).toDF("k").createOrReplaceTempView("rbp_dim")
    val got = spark.sql(
      s"SELECT f.k, f.v FROM $cat.db.fact f JOIN rbp_dim d ON f.k = d.k ORDER BY f.k")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((3L, "v3"), (7L, "v7")))
  }
}
