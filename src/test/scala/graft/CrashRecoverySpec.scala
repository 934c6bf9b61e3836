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
}
