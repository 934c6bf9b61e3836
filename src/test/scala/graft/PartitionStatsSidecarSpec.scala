package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.table.{GraftTable, PartitionField}

/** pstats sidecar: partitioned commits record per-leaf [files, rows,
  * bytes] once at write time; the #partitions metadata table serves from
  * the sidecar with zero data-file I/O, falls back to the footer walk
  * for dirs without one, and aggregates mixed dirs correctly. */
class PartitionStatsSidecarSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def mkDocs() = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0),
    (4L, "b", 40.0), (5L, "c", 50.0)).toDF("id", "grp", "v")

  private def sidecarFiles(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(s"$dir/_graft_log/pstats")
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq.filterNot(_.getName.startsWith(".")) // skip .crc
  }

  test("partitioned append records one pstats sidecar; unpartitioned records none") {
    val pd = TestSpark.tmpDir("pstats_p")
    val t = GraftTable.create(spark, pd, mkDocs().schema,
      spec = Seq(PartitionField("grp", "identity")))
    t.append(mkDocs())
    assert(sidecarFiles(pd).size === 1)
    val ud = TestSpark.tmpDir("pstats_u")
    GraftTable.create(spark, ud, mkDocs().schema).append(mkDocs())
    assert(sidecarFiles(ud).isEmpty,
      "plain appends must not pay the per-leaf footer sweep")
  }

  test("partitions metadata from the sidecar equals the footer-walk fallback") {
    val pd = TestSpark.tmpDir("pstats_eq")
    val t = GraftTable.create(spark, pd, mkDocs().schema,
      spec = Seq(PartitionField("grp", "identity")))
    t.append(mkDocs())
    t.append(mkDocs().filter(col("grp") =!= "c"))
    val served = t.partitions.collect().map(_.toSeq).toSeq
    sidecarFiles(pd).foreach(_.delete())
    val walked = GraftTable.load(spark, pd).partitions.collect().map(_.toSeq).toSeq
    assert(served === walked)
    // and the values are right: grp=a has 4 rows across two commits
    val byPart = served.map(r => r.head.toString -> r(2)).toMap
    assert(byPart("grp=a") === 4L)
    assert(byPart("grp=c") === 1L)
  }

  test("mixed dirs: sidecar-served and legacy walk aggregate together") {
    val pd = TestSpark.tmpDir("pstats_mix")
    val t = GraftTable.create(spark, pd, mkDocs().schema,
      spec = Seq(PartitionField("grp", "identity")))
    t.append(mkDocs())
    // simulate a pre-sidecar dir: drop the first commit's sidecar only
    sidecarFiles(pd).foreach(_.delete())
    t.append(mkDocs())
    assert(sidecarFiles(pd).size === 1)
    val byPart = GraftTable.load(spark, pd).partitions.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byPart("grp=a") === 4L)
    assert(byPart("grp=b") === 4L)
    assert(byPart("grp=c") === 2L)
  }

  test("vacuum sweeps the pstats sidecar of a dead dir, keeps live ones") {
    val pd = TestSpark.tmpDir("pstats_gc")
    val t = GraftTable.create(spark, pd, mkDocs().schema,
      spec = Seq(PartitionField("grp", "identity")))
    t.append(mkDocs())
    t.append(mkDocs())
    assert(sidecarFiles(pd).size === 2)
    t.compact() // rewrites data dirs; old dirs become unreferenced
    t.expireSnapshots(keepLast = 1)
    t.vacuumOrphans(olderThanMs = 0L)
    val live = GraftTable.load(spark, pd).snapshot.dataDirs
      .map(d => d.path.substring(d.path.lastIndexOf('/') + 1)).toSet
    val remaining = sidecarFiles(pd).map(_.getName.stripSuffix(".json")).toSet
    assert(remaining.subsetOf(live),
      s"dead-dir sidecars must be swept: live=$live remaining=$remaining")
    // the compacted dir's own sidecar survives and still serves
    val byPart = GraftTable.load(spark, pd).partitions.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byPart("grp=a") === 4L)
  }
}
