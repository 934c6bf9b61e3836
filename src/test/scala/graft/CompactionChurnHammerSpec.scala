package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Compaction racing live rowDelta churn (VERDICT r12 item 6) — the
  * optimistic-commit analog of Iceberg's validate-then-commit, on the
  * exact table shape the governed ANN/dedup indexes churn
  * (identity-partitioned assignments, equality rowDeltas keyed on the
  * row id): `ann_index_churn` compacts quiescently; this hammer runs
  * `compact()` WHILE erasure-delete and upsert rowDeltas commit, and
  * asserts the probe-visible state is never torn:
  *
  *  - a compact that lost the race must abort-and-retry (retryCow), not
  *    silently discard the concurrent rowDelta (lost update);
  *  - a rowDelta that lost the race folds forward through OCC rebase
  *    onto the compacted base — its delete file (newer version) still
  *    applies to the rewritten data dir;
  *  - NO snapshot in the entire history may show a duplicated or
  *    half-upserted key (the delete+append pair is one atomic commit);
  *  - every compact commit is content-identical to its predecessor
  *    (compaction is a physical rewrite, never a semantic one);
  *  - the final state equals the serial application of all churn rounds.
  */
class CompactionChurnHammerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  /** compact() retries its OCC races internally (retryCow, 5 attempts)
    * and then throws IllegalStateException wrapping the collision; under
    * a deliberate hammer that bound is hit legitimately — retry the
    * whole statement, which is the documented contract. Raw
    * ConcurrentOverwriteException covers paths without the retryCow
    * wrapper. */
  private def retrying[A](what: String, n: Int = 20)(body: => A): A = {
    var last: Throwable = null
    var i = 0
    while (i < n) {
      try return body
      catch {
        case e: GraftTable.ConcurrentOverwriteException => last = e; i += 1
        case e: IllegalStateException
          if e.getCause.isInstanceOf[GraftTable.ConcurrentOverwriteException] =>
          last = e; i += 1
      }
    }
    throw new AssertionError(s"$what lost $n straight OCC races", last)
  }

  test("compact() racing erasure + upsert rowDeltas never serves a torn state") {
    val dir = TestSpark.tmpDir("gt-churn-compact") + "/t"
    GraftTable.create(spark, dir, StructType(Seq(
        StructField("cluster", IntegerType), StructField("vec_id", LongType),
        StructField("v", StringType))),
      spec = Seq(graft.table.PartitionField("cluster", "identity")))
    val n = 120L
    val seed = (0L until n).map(id => ((id % 8).toInt, id, "r0"))
      .toDF("cluster", "vec_id", "v")
    GraftTable.load(spark, dir).append(seed)
    GraftTable.load(spark, dir).upgradeFormat(2)
    val erased = (0L until n).filter(_ % 7 == 3)
    val upserted = (0L until n).filter(id => id % 5 == 1 && id % 7 != 3)
    val rounds = 5
    // churn writer: one erasure delete, then serial re-assign upsert
    // rounds (each moves the cohort to a new cluster partition — the
    // re-embedding shape), all racing the compactor below
    val churn = Future {
      retrying("erasure rowDelta") {
        GraftTable.load(spark, dir).rowDelta(
          erased.toDF("vec_id"), seed.limit(0), Seq("vec_id"))
      }
      (1 to rounds).foreach { r =>
        retrying(s"upsert rowDelta r$r") {
          val rows = upserted.map(id => (((id + r) % 8).toInt, id, s"r$r"))
            .toDF("cluster", "vec_id", "v")
          GraftTable.load(spark, dir).rowDelta(
            upserted.toDF("vec_id"), rows, Seq("vec_id"))
        }
      }
    }
    // compactor: hammer the maintenance pass while the churn commits
    (1 to 8).foreach { i =>
      retrying(s"compact $i")(GraftTable.load(spark, dir).compact())
      Thread.sleep(50)
    }
    Await.result(churn, 600.seconds)
    retrying("final compact")(GraftTable.load(spark, dir).compact())

    // final state == the serial application of all churn rounds
    val fin = GraftTable.load(spark, dir).toDF
      .select(col("cluster"), col("vec_id"), col("v")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    val byId = fin.groupBy(_._2)
    assert(fin.length == n - erased.length,
      s"${fin.length} rows vs expected ${n - erased.length}")
    erased.foreach(id => assert(!byId.contains(id), s"erased id $id survived"))
    upserted.foreach { id =>
      val rows = byId.getOrElse(id, Array.empty)
      assert(rows.length == 1, s"upserted id $id appears ${rows.length} times")
      assert(rows.head == (((id + rounds) % 8).toInt, id, s"r$rounds"),
        s"upserted id $id is ${rows.head}, expected last round r$rounds")
    }
    (0L until n).filterNot(id => erased.contains(id) || upserted.contains(id))
      .foreach { id =>
        val rows = byId.getOrElse(id, Array.empty)
        assert(rows.length == 1 && rows.head._3 == "r0",
          s"untouched id $id is ${rows.mkString(",")}")
      }

    // snapshot-history atomicity: every version of the log is readable,
    // never shows a duplicated key, and every compact (overwrite) commit
    // is content-identical to its predecessor
    val t = GraftTable.load(spark, dir)
    (1 to t.currentVersion).foreach { ver =>
      val at = t.asOf(ver)
      val ids = at.groupBy(col("vec_id")).count()
        .filter(col("count") > 1).count()
      assert(ids == 0, s"v$ver shows $ids duplicated keys (torn upsert)")
      if (t.snapshotAt(ver).op == "overwrite") {
        val prev = t.asOf(ver - 1)
        val drift = at.exceptAll(prev).count() + prev.exceptAll(at).count()
        assert(drift == 0,
          s"compact at v$ver changed content ($drift differing rows)")
      }
    }

    // GDPR closer, the ANN-side symmetry of DedupIndexErasureSpec: after
    // expiring every pre-compaction snapshot and sweeping orphans, the
    // churned-away cohort is PHYSICALLY unreachable — time travel fails
    // cleanly and no surviving parquet byte (data files or the delete
    // files that name the forgotten keys) holds an erased vec_id
    GraftTable.load(spark, dir).expireSnapshots(1)
    GraftTable.load(spark, dir).vacuumOrphans(0)
    val t2 = GraftTable.load(spark, dir)
    (0 until t2.currentVersion).foreach { v =>
      val e = intercept[Exception] { t2.asOf(v).collect() }
      assert(e.getMessage.contains("expired"),
        s"asOf($v) failed with '${e.getMessage}' instead of expired")
    }
    import scala.jdk.CollectionConverters._
    val leaked = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => p.toString.endsWith(".parquet"))
      .iterator().asScala.map(_.toString).toSeq
      .map { f =>
        val df = spark.read.parquet(f)
        if (!df.columns.contains("vec_id")) 0L
        else df.filter(col("vec_id").isInCollection(erased)).count()
      }.sum
    assert(leaked == 0, s"$leaked erased-cohort rows survive on disk")
  }
}
