package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Focused spec for the r14 write/read internals changes:
  *
  *  - writeData's SMALL-COMMIT fast path (planner-estimate gate →
  *    coalesce(1)+sort) must produce ONE sorted file per tiny keyed
  *    commit and keep every read law intact;
  *  - dfAt's SINGLE-RELATION MoR read (per-file-path version derivation
  *    replacing one-relation-per-dir unions) must apply equality deletes
  *    with the exact same strictly-older-commit semantics, including
  *    same-key re-inserts in later commits (the __cv < __dv guard). */
class SmallCommitLayoutSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("small-commit-layout-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def tmp(n: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$n").toString + "/t"

  test("tiny keyed commit takes the 1-file fast path and stays key-sorted") {
    import spark.implicits._
    import graft.table.GraftTable
    val df = (1 to 500).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val t = GraftTable.create(spark, tmp("small1"), df.schema, key = Seq("id"))
    t.append(df)
    val dataFiles = {
      val dir = new java.io.File(t.dir)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet") &&
                 f.getPath.contains("/data/")) Seq(f)
        else Nil
      walk(dir)
    }
    assert(dataFiles.size == 1,
      s"small commit should write one file, wrote ${dataFiles.size}")
    // the single file is globally key-sorted (the fast path's layout claim)
    val ids = spark.read.parquet(dataFiles.head.getPath)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted, "fast-path file is not key-sorted")
    // and the read law holds
    assert(t.toDF.count() == 500)
  }

  test("single-relation MoR read keeps strictly-older delete semantics") {
    import spark.implicits._
    import graft.table.GraftTable
    val mk = (r: Range, tag: String) => r.map(i => (i.toLong, tag)).toDF("id", "v")
    val t = GraftTable.create(spark, tmp("mor1"),
      mk(1 to 1, "x").schema, key = Seq("id"), formatVersion = 2)
    t.append(mk(1 to 100, "a"))                       // v1
    t.append(mk(101 to 150, "b"))                     // v2
    // v3: upsert ids 1..50 — delete file at v3 + re-insert dir at v3;
    // the re-inserted rows must SURVIVE their own commit's delete file
    t.rowDelta(mk(1 to 50, "ignored").select("id"), mk(1 to 50, "c"), Seq("id"))
    // v4: pure delete of ids 101..120 (no replacement rows)
    t.rowDelta(mk(101 to 120, "ignored").select("id"),
      mk(1 to 0, "z"), Seq("id"))
    val rows = GraftTable.load(spark, t.dir).toDF
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.size == 130, s"expected 130 live rows, got ${rows.size}")
    (1 to 50).foreach(i => assert(rows(i.toLong) == "c", s"id $i not upserted"))
    (51 to 100).foreach(i => assert(rows(i.toLong) == "a"))
    (101 to 120).foreach(i => assert(!rows.contains(i.toLong), s"id $i not deleted"))
    (121 to 150).foreach(i => assert(rows(i.toLong) == "b"))
    // compaction (a full rewrite through the same read) is invariant
    GraftTable.load(spark, t.dir).compact()
    val after = GraftTable.load(spark, t.dir).toDF
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after == rows, "compaction changed the MoR answer")
  }

  test("large commits keep the scale-out range layout (estimate gate)") {
    import spark.implicits._
    import graft.table.GraftTable
    // force the gate shut: a tiny threshold means even this commit is
    // "large", so the range branch must run and still answer identically
    val prev = spark.conf.getOption("graft.write.smallCommitBytes")
    spark.conf.set("graft.write.smallCommitBytes", "1")
    try {
      val df = (1 to 500).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      val t = GraftTable.create(spark, tmp("big1"), df.schema, key = Seq("id"))
      t.append(df)
      assert(t.toDF.count() == 500)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("graft.write.smallCommitBytes", v)
        case None => spark.conf.unset("graft.write.smallCommitBytes")
      }
    }
  }
}
