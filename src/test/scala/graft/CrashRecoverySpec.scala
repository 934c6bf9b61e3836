package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.table._

/** Crash-window behavior of the commit protocol. The slot claim is
  * `File.createNewFile()` (O_EXCL) followed by streaming the JSON in —
  * so a reader can observe a claimed-but-empty entry. These specs pin
  * the two documented outcomes: a reader RETRIES through the streaming
  * window (and succeeds once content lands), and an ABANDONED claim
  * (writer died post-claim) fails loudly instead of hanging or
  * silently skipping the version. */
class CrashRecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("reader retries through a claimed-but-streaming commit window") {
    val dir = TestSpark.tmpDir("crash-stream")
    val t = GraftTable.create(spark, dir, schema)
    t.append(Seq((1L, "a")).toDF("id", "v"))
    val log = new java.io.File(dir, "_graft_log")
    val v1 = new java.io.File(log, "v00001.json")
    val v2 = new java.io.File(log, "v00002.json")
    // simulate a concurrent writer: slot claimed (empty file exists),
    // content arrives 300ms later — a version-2 snapshot body (the v1
    // entry re-stamped, the shape a rollback commit produces)
    assert(v2.createNewFile())
    val body = new String(java.nio.file.Files.readAllBytes(v1.toPath), "UTF-8")
      .replaceFirst("\"version\"\\s*:\\s*1", "\"version\":2")
    val writer = new Thread(() => {
      Thread.sleep(300)
      java.nio.file.Files.write(v2.toPath, body.getBytes("UTF-8"))
    })
    writer.start()
    try {
      // load() resolves currentVersion = 2 (the claim exists) and must
      // retry through the empty-file window instead of declaring the
      // log corrupt
      val loaded = GraftTable.load(spark, dir)
      assert(loaded.snapshot.version == 2)
      assert(loaded.toDF.count() == 1)
    } finally writer.join()
  }

  test("an abandoned claim (writer died post-claim) fails loudly, not silently") {
    val dir = TestSpark.tmpDir("crash-abandon")
    val t = GraftTable.create(spark, dir, schema)
    t.append(Seq((1L, "a")).toDF("id", "v"))
    val v2 = new java.io.File(new java.io.File(dir, "_graft_log"), "v00002.json")
    assert(v2.createNewFile()) // claim with no content, forever
    val e = intercept[IllegalStateException] {
      GraftTable.load(spark, dir).snapshot
    }
    assert(e.getMessage.contains("unreadable snapshot entry"),
      s"unexpected failure mode: ${e.getMessage}")
    // recovery: removing the dead claim restores the table untouched
    assert(v2.delete())
    assert(GraftTable.load(spark, dir).toDF.count() == 1)
  }

  test("a crashed writer's data dir (no commit) is invisible and vacuumable") {
    val dir = TestSpark.tmpDir("crash-orphan")
    val t = GraftTable.create(spark, dir, schema)
    t.append(Seq((1L, "a")).toDF("id", "v"))
    // simulate a writer that died after writing data but before commit
    val orphan = new java.io.File(dir, "data/dead-writer-uuid")
    orphan.mkdirs()
    Seq((99L, "ghost")).toDF("id", "v").write.mode("overwrite")
      .parquet(orphan.getAbsolutePath + "/files")
    assert(t.toDF.count() == 1, "uncommitted data leaked into reads")
    assert(t.toDF.filter($"id" === 99L).count() == 0)
    val removed = t.vacuumOrphans(olderThanMs = -1000)
    assert(removed.exists(_.contains("dead-writer-uuid")))
    assert(t.toDF.count() == 1)
  }

  test("crashed-publish window: abortStaged on an already-published marker " +
    "consumes the marker without deleting referenced data") {
    val dir = TestSpark.tmpDir("crash-wap")
    val t = GraftTable.create(spark, dir, schema, key = Seq("id"))
    t.append(Seq((1L, "seed")).toDF("id", "v"))
    val id = t.stageAppend(Seq((2L, "staged")).toDF("id", "v"))
    val marker = java.nio.file.Paths.get(dir, "_graft_log", "staged", s"$id.json")
    val markerBytes = java.nio.file.Files.readAllBytes(marker)
    t.publishStaged(id)
    val before = GraftTable.load(spark, dir).toDF
      .as[(Long, String)].collect().toMap
    assert(before == Map(1L -> "seed", 2L -> "staged"))
    // the crash window: publish committed, the marker delete never ran
    java.nio.file.Files.write(marker, markerBytes)
    // an operator (or a sweeper) aborting the apparently-pending stage
    // must consume the marker but MUST NOT touch the published data
    GraftTable.load(spark, dir).abortStaged(id)
    val after = GraftTable.load(spark, dir)
    assert(after.toDF.as[(Long, String)].collect().toMap == before,
      "abort after a crashed publish deleted referenced data")
    assert(after.stagedIds.isEmpty, "the stale marker must still be consumed")
    // a genuinely-unpublished stage still aborts WITH its data removed
    val id2 = t.stageAppend(Seq((3L, "never")).toDF("id", "v"))
    GraftTable.load(spark, dir).abortStaged(id2)
    assert(GraftTable.load(spark, dir).toDF.as[(Long, String)]
      .collect().toMap == before)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "data", id2)),
      "an unpublished abort must remove its data dir")
  }

  test("crashed-expiry window: marker lands before the data delete, so the " +
    "residue is a vacuumable orphan, never a broken time-travel read") {
    val dir = TestSpark.tmpDir("crash-expire")
    val t = GraftTable.create(spark, dir, schema, key = Seq("id"))
    t.append(Seq((1L, "v1")).toDF("id", "v"))
    // CoW delete rewrites the dir: v1's original dir is now referenced
    // ONLY by v1 — the dir expiry will actually reclaim
    t.delete(col("id") === 1L)
    t.append(Seq((3L, "v3")).toDF("id", "v"))
    val pre = GraftTable.load(spark, dir)
    assert(pre.asOf(1).count() == 1)
    val kept = Seq(2, 3).flatMap(v => pre.snapshotAt(v).dataDirs.map(_.path)).toSet
    val v1Dirs = pre.snapshotAt(1).dataDirs.map(_.path).filterNot(kept)
    assert(v1Dirs.nonEmpty, "fixture must give v1 a uniquely-referenced dir")
    // stash the dirs expiry will delete, then expire
    val stash = java.nio.file.Files.createTempDirectory("stash")
    def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      java.nio.file.Files.walk(from).forEach { src =>
        val dst = to.resolve(from.relativize(src))
        if (java.nio.file.Files.isDirectory(src)) java.nio.file.Files.createDirectories(dst)
        else java.nio.file.Files.copy(src, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    v1Dirs.foreach { rel =>
      copyTree(java.nio.file.Paths.get(dir, rel), stash.resolve(rel.replace('/', '_')))
    }
    t.expireSnapshots(keepLast = 2)
    // reconstruct the crash-after-marker state: marker written, dirs intact
    v1Dirs.foreach { rel =>
      copyTree(stash.resolve(rel.replace('/', '_')), java.nio.file.Paths.get(dir, rel))
    }
    val live = GraftTable.load(spark, dir)
    // reader outcome in the window: the CLEAN expired error, not ENOENT
    assertThrows[Exception](live.asOf(1).count())
    // the residue is an unreferenced dir: vacuum sweeps exactly it and
    // query results never change
    val before = live.toDF.as[(Long, String)].collect().toMap
    val swept = live.vacuumOrphans(olderThanMs = -1000)
    assert(v1Dirs.forall(d => swept.contains(d)),
      s"vacuum missed crash residue: swept=$swept expected=$v1Dirs")
    assert(GraftTable.load(spark, dir).toDF.as[(Long, String)]
      .collect().toMap == before)
  }
}
