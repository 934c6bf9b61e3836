package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** The REWRITE maintenance paths racing live churn (VERDICT r13 item 4)
  * — CompactionChurnHammerSpec's discipline extended to
  * `rewriteZOrder` / `rewriteSmallDirs`, whose lost-update guards
  * (commitRewrite's deletes-empty + dir-set containment validation)
  * were spec-covered but never exercised under a live interleaving.
  *
  * Test 1 engineers the race DETERMINISTICALLY instead of spinning for
  * a rare window (the lesson of the first draft of this hammer, which
  * livelocked two retry loops for minutes): the rewrite runs on a table
  * big enough that its write phase takes seconds, and a small rowDelta
  * commits mid-flight — the rewrite MUST abort at its commit guard
  * (committing would re-stamp the rewritten rows NEWER than the delete's
  * version, so the rowDelta would silently never apply to them — the
  * exact lost-update class compact() had in r13). The retry half then
  * lands clean and the rowDelta's update is asserted to have SURVIVED.
  *
  * Test 2 is a bounded live-churn interleaving: rowDelta/append churn vs
  * compact+rewrite rounds, final state == the serial application.
  */
class RewriteChurnHammerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def retrying[A](what: String, n: Int = 20)(body: => A): A = {
    var last: Throwable = null
    var i = 0
    while (i < n) {
      try return body
      catch {
        case e: GraftTable.ConcurrentOverwriteException => last = e; i += 1
        case e: IllegalArgumentException
          if e.getMessage != null && e.getMessage.contains("retry the statement") =>
          last = e; i += 1
      }
    }
    throw new AssertionError(s"$what lost $n straight OCC races", last)
  }

  /** One deterministic mid-rewrite rowDelta race. A plain `rowDelta`
    * cannot reliably land mid-rewrite on a FIFO local scheduler — its
    * own Spark jobs queue BEHIND the rewrite's write job (the first
    * draft of this race flaked exactly that way under a loaded suite
    * JVM). So the delta's parquet is pre-written OUTSIDE the race and
    * landed with the metadata-only `commitDelta` (one log write, no
    * Spark jobs): start `rewrite` on a table big enough that its write
    * phase takes seconds, commit the staged delta 300 ms in — squarely
    * inside the write window — and demand the rewrite's commit guard
    * fires. Returns true if it did (false = a miss; the retry loop
    * re-arms). */
  private def raceOnce(dir: String, fire: () => Unit): Boolean = {
    val delSub = s"deletes/race-${java.util.UUID.randomUUID()}"
    val dataSub = s"data/race-${java.util.UUID.randomUUID()}"
    Seq(7L, 19L).toDF("vec_id").write.parquet(s"$dir/$delSub")
    Seq((0, 7L, "raced"), (1, 19L, "raced")).toDF("cluster", "vec_id", "v")
      .write.parquet(s"$dir/$dataSub")
    val rewrite = Future { fire() }
    Thread.sleep(300) // rewrite passed its entry check; its write is in flight
    retrying("racing delta commit") {
      val t = GraftTable.load(spark, dir)
      t.commitDelta(dataSub, 2L, delSub, 2L, Seq("vec_id"), t.currentVersion)
    }
    try { Await.result(rewrite, 600.seconds); false }
    catch {
      case e: IllegalArgumentException
        if e.getMessage != null && e.getMessage.contains("lost a race") => true
      // the delta landed BEFORE the rewrite read its snapshot: the entry
      // precondition aborted it instead — also a conflict abort, but not
      // the commit guard we are hunting; count as a miss
      case e: IllegalArgumentException
        if e.getMessage != null && e.getMessage.contains("compact()") => false
    }
  }

  private def freshBigTable(tag: String, rows: Long, slices: Int): String = {
    val dir = TestSpark.tmpDir(s"gt-rw-$tag") + "/t"
    GraftTable.create(spark, dir, StructType(Seq(
      StructField("cluster", IntegerType), StructField("vec_id", LongType),
      StructField("v", StringType))))
    val big = spark.range(rows).select(
      (col("id") % 8).cast(IntegerType).as("cluster"),
      col("id").as("vec_id"),
      concat(lit("payload-"), col("id")).as("v"))
    // several commits so rewriteSmallDirs has a tail to fold (and enough
    // rows that the rewrite's write phase outlasts the racing rowDelta)
    (0 until slices).foreach(i =>
      GraftTable.load(spark, dir).append(big.filter(col("id") % slices === i)))
    GraftTable.load(spark, dir).upgradeFormat(2)
    dir
  }

  private def assertHealed(dir: String, nRows: Long): Unit = {
    val t = GraftTable.load(spark, dir)
    val fin = t.toDF.filter(col("vec_id").isin(7L, 19L))
      .select(col("v")).collect().map(_.getString(0))
    assert(fin.length == 2 && fin.forall(_ == "raced"),
      s"the raced rowDelta's update was LOST by the rewrite: ${fin.mkString(",")}")
    assert(t.toDF.count() == nRows, "row count drifted through abort/retry")
    // rewrite commits in the history are content-identical to their
    // predecessor (rewrites are physical, never semantic)
    (1 to t.currentVersion).filter(v => t.snapshotAt(v).op == "rewrite").foreach { v =>
      val drift = t.asOf(v).exceptAll(t.asOf(v - 1)).count() +
        t.asOf(v - 1).exceptAll(t.asOf(v)).count()
      assert(drift == 0, s"rewrite at v$v changed content ($drift rows)")
    }
  }

  test("rewriteZOrder racing a rowDelta aborts at the commit guard; retry keeps the update") {
    val dir = freshBigTable("zorder", 400000L, 2)
    var guardFired = false
    var tries = 0
    while (!guardFired && tries < 4) {
      tries += 1
      guardFired = raceOnce(dir,
        () => GraftTable.load(spark, dir).rewriteZOrder("cluster", "vec_id"))
      if (!guardFired) // clear the landed delta so the next try races clean
        retrying("compact")(GraftTable.load(spark, dir).compact())
    }
    assert(guardFired,
      s"rewriteZOrder's commit guard never fired in $tries engineered races")
    // the retry half: apply deletes, re-run — lands clean
    retrying("compact")(GraftTable.load(spark, dir).compact())
    GraftTable.load(spark, dir).rewriteZOrder("cluster", "vec_id")
    assertHealed(dir, 400000L)
  }

  test("rewriteSmallDirs racing a rowDelta aborts at the commit guard; retry keeps the update") {
    val dir = freshBigTable("smalldirs", 800000L, 8)
    var guardFired = false
    var tries = 0
    while (!guardFired && tries < 4) {
      tries += 1
      guardFired = raceOnce(dir,
        () => GraftTable.load(spark, dir).rewriteSmallDirs(1L << 30))
      if (!guardFired) {
        // clear the landed delta, then re-fragment (compact left one dir;
        // the next race needs >=2 small dirs and a seconds-long rewrite)
        retrying("compact")(GraftTable.load(spark, dir).compact())
        GraftTable.load(spark, dir).append(
          spark.range(1000000L + tries * 200000L, 1200000L + tries * 200000L)
            .select((col("id") % 8).cast(IntegerType).as("cluster"),
              col("id").as("vec_id"), concat(lit("p-"), col("id")).as("v")))
      }
    }
    assert(guardFired,
      s"rewriteSmallDirs' commit guard never fired in $tries engineered races")
    // the retry half: apply deletes, re-fragment one small dir, re-run —
    // the fold lands clean and the raced update survives it
    retrying("compact")(GraftTable.load(spark, dir).compact())
    GraftTable.load(spark, dir).append(
      Seq((0, 999999L, "tail")).toDF("cluster", "vec_id", "v"))
    GraftTable.load(spark, dir).rewriteSmallDirs(1L << 30)
    assert(GraftTable.load(spark, dir).snapshot.dataDirs.length == 1,
      "retry half: bin-pack fold did not land after the conflict cleared")
    assertHealed(dir, GraftTable.load(spark, dir).toDF.count())
  }

  test("bounded live churn: rewrites + compact vs rowDelta/append rounds end serial") {
    val dir = TestSpark.tmpDir("gt-rw-churn") + "/t"
    GraftTable.create(spark, dir, StructType(Seq(
      StructField("cluster", IntegerType), StructField("vec_id", LongType),
      StructField("v", StringType))))
    val n = 120L
    val seed = (0L until n).map(id => ((id % 8).toInt, id, "r0"))
      .toDF("cluster", "vec_id", "v")
    GraftTable.load(spark, dir).append(seed)
    GraftTable.load(spark, dir).upgradeFormat(2)
    val upserted = (0L until n).filter(_ % 5 == 1)
    val rounds = 5
    val churn = Future {
      (1 to rounds).foreach { r =>
        retrying(s"upsert r$r") {
          GraftTable.load(spark, dir).rowDelta(
            upserted.toDF("vec_id"),
            upserted.map(id => (((id + r) % 8).toInt, id, s"r$r"))
              .toDF("cluster", "vec_id", "v"),
            Seq("vec_id"))
        }
        retrying(s"append a$r") {
          GraftTable.load(spark, dir).append(
            Seq(((r % 8), 1000L + r, s"a$r")).toDF("cluster", "vec_id", "v"))
        }
      }
    }
    var aborts = 0
    (1 to 8).foreach { i =>
      try retrying(s"compact $i")(GraftTable.load(spark, dir).compact())
      catch { case _: AssertionError => () }
      try GraftTable.load(spark, dir).rewriteZOrder("cluster", "vec_id")
      catch { case e: IllegalArgumentException
        if e.getMessage != null && (e.getMessage.contains("lost a race") ||
          e.getMessage.contains("compact()")) => aborts += 1 }
      try GraftTable.load(spark, dir).rewriteSmallDirs(1L << 30)
      catch { case e: IllegalArgumentException
        if e.getMessage != null && (e.getMessage.contains("lost a race") ||
          e.getMessage.contains("compact()")) => aborts += 1 }
      Thread.sleep(50)
    }
    Await.result(churn, 600.seconds)
    info(s"$aborts rewrite aborts under live churn")
    retrying("final compact")(GraftTable.load(spark, dir).compact())
    GraftTable.load(spark, dir).rewriteZOrder("cluster", "vec_id")
    val fin = GraftTable.load(spark, dir).toDF
      .select(col("cluster"), col("vec_id"), col("v")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    val byId = fin.groupBy(_._2)
    assert(fin.length == n + rounds, s"${fin.length} rows vs ${n + rounds}")
    upserted.foreach { id =>
      val rows = byId.getOrElse(id, Array.empty)
      assert(rows.length == 1 && rows.head == (((id + rounds) % 8).toInt, id, s"r$rounds"),
        s"upserted id $id is ${rows.mkString(",")}")
    }
    (1 to rounds).foreach { r =>
      val rows = byId.getOrElse(1000L + r, Array.empty)
      assert(rows.length == 1 && rows.head._3 == s"a$r",
        s"appended id ${1000 + r} is ${rows.mkString(",")} — dropped or duplicated by a rewrite")
    }
    (0L until n).filterNot(upserted.contains).foreach { id =>
      val rows = byId.getOrElse(id, Array.empty)
      assert(rows.length == 1 && rows.head._3 == "r0", s"untouched id $id is ${rows.mkString(",")}")
    }
  }
}
