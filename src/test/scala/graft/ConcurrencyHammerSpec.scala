package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Multi-writer race hammer (VERDICT r6 item 8).
  *
  * CrashRecoverySpec covers single-writer crash windows; this suite runs
  * genuinely concurrent append / rowDelta-upsert / compact writers over
  * ONE table and asserts lost-update freedom plus snapshot atomicity:
  *
  *  - every appended key survives to the end (appends fold through OCC
  *    rebase and may never vanish under a racing compact or upsert);
  *  - the upsert writer's rounds are serial, so the final value of every
  *    upserted key is its LAST round (a stale-rebase bug would leave an
  *    older round's value or a mix);
  *  - a concurrent reader never observes a torn upsert: all upserted
  *    keys carry the SAME round value in every snapshot (rowDelta's
  *    delete+rows pair is one atomic commit);
  *  - compaction changes layout only — a reader sees identical content
  *    before/after any number of racing compacts.
  */
class ConcurrencyHammerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  /** compact() retries 4 OCC races internally then throws; under the
    * hammer that bound can be hit legitimately — retry the statement,
    * which is the documented contract. */
  private def retrying[A](what: String, n: Int = 12)(body: => A): A = {
    var last: Throwable = null
    var i = 0
    while (i < n) {
      try return body
      catch { case e: GraftTable.ConcurrentOverwriteException => last = e; i += 1 }
    }
    throw new AssertionError(s"$what lost $n straight OCC races", last)
  }

  test("append x rowDelta-upsert x compact hammer: no lost updates, no torn upserts") {
    val dir = TestSpark.tmpDir("gt-hammer")
    val t0 = GraftTable.create(spark, dir, schema, key = Seq("k"))
    t0.append(spark.range(1, 11).select(col("id").as("k"), lit("seed").as("v")))
    t0.upgradeFormat(2)
    val rounds = 4

    val appender = Future {
      (0 until rounds).foreach { r =>
        retrying(s"append r$r") {
          GraftTable.load(spark, dir)
            .append(Seq((1000L + r, s"a$r")).toDF("k", "v"))
        }
      }
    }
    val upserter = Future {
      (0 until rounds).foreach { r =>
        retrying(s"upsert r$r") {
          GraftTable.load(spark, dir).rowDelta(
            spark.range(1, 11).select(col("id").as("k")),
            spark.range(1, 11).select(col("id").as("k"), lit(s"u$r").as("v")),
            Seq("k"))
        }
      }
    }
    val compactor = Future {
      (0 until rounds).foreach { _ =>
        retrying("compact") { GraftTable.load(spark, dir).compact() }
      }
    }
    val reader = Future {
      var torn = List.empty[String]
      (0 until 2 * rounds).foreach { _ =>
        val rows = GraftTable.load(spark, dir).toDF
          .filter(col("k") <= 10).select("k", "v").as[(Long, String)]
          .collect()
        // snapshot atomicity: one upsert round visible across ALL keys
        if (rows.map(_._2).distinct.length != 1)
          torn ::= rows.sortBy(_._1).mkString(",")
        if (rows.length != 10)
          torn ::= s"saw ${rows.length} of 10 upserted keys"
      }
      torn
    }

    Await.result(Future.sequence(Seq(appender, upserter, compactor)), 300.seconds)
    val torn = Await.result(reader, 300.seconds)
    assert(torn.isEmpty, s"reader observed torn snapshots:\n  ${torn.mkString("\n  ")}")

    val fin = GraftTable.load(spark, dir)
    val byKey = fin.toDF.as[(Long, String)].collect().toMap
    assert(byKey.size == 10 + rounds, s"row count drifted: ${byKey.size}")
    (0 until rounds).foreach(r =>
      assert(byKey(1000L + r) == s"a$r", s"append round $r lost"))
    (1L to 10L).foreach(k =>
      assert(byKey(k) == s"u${rounds - 1}",
        s"key $k = ${byKey(k)}, expected final upsert round u${rounds - 1}"))
  }

  test("parallel rowDelta writers with the same key set: last commit wins per key, none vanish") {
    val dir = TestSpark.tmpDir("gt-hammer-delta")
    val t0 = GraftTable.create(spark, dir, schema, key = Seq("k"))
    t0.append(Seq((1L, "seed"), (2L, "seed")).toDF("k", "v"))
    t0.upgradeFormat(2)
    // two writers upsert DISJOINT keys concurrently — both must land
    // (delete files only match their own key values)
    val fs = Seq(1L, 2L).map { k =>
      Future {
        retrying(s"delta k$k") {
          GraftTable.load(spark, dir).rowDelta(
            Seq(k).toDF("k"),
            Seq((k, s"w$k")).toDF("k", "v"),
            Seq("k"))
        }
      }
    }
    Await.result(Future.sequence(fs), 300.seconds)
    val got = GraftTable.load(spark, dir).toDF.as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "w1", 2L -> "w2"), s"got $got")
  }
}
