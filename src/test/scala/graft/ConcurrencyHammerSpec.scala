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

  test("streaming sink races a batch appender: exactly-once epochs, no lost commits") {
    implicit val sqlCtx = spark.sqlContext
    val wh = TestSpark.tmpDir("gt-stream-race")
    val cat = s"graftsr${java.util.UUID.randomUUID().toString.take(8)}"
    graft.catalog.GraftCatalog.register(spark, wh, cat)
    val idv = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    GraftTable.create(spark, s"$wh/db/race", idv)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = mem.toDS().toDF("id", "v")
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("race-cp").toString)
      .outputMode("append")
      .toTable(s"$cat.db.race")
    val rounds = 4
    try {
      (0 until rounds).foreach { r =>
        // the batch appender commits WHILE the sink's epoch is in flight
        val batch = Future {
          retrying(s"batch append r$r") {
            GraftTable.load(spark, s"$wh/db/race")
              .append((0 until 5).map(i => (1000L * (r + 1) + i, s"b$r"))
                .toDF("id", "v"))
          }
        }
        mem.addData((0 until 10).map(i => (100000L + 10L * r + i, s"s$r")): _*)
        q.processAllAvailable()
        Await.result(batch, 120.seconds)
      }
      // stop, reload fresh: every stream row exactly once (the epoch
      // ledger must absorb OCC rebases without re-applying an epoch),
      // every batch commit intact
      q.stop(); q.awaitTermination()
      val rows = GraftTable.load(spark, s"$wh/db/race").toDF
        .select(col("id"), col("v")).as[(Long, String)].collect().toSeq
      assert(rows.size === rows.map(_._1).distinct.size, "duplicate ids: an epoch re-applied")
      val streamRows = rows.filter(_._1 >= 100000L)
      val batchRows = rows.filter(_._1 < 100000L)
      assert(streamRows.size === rounds * 10,
        s"stream rows lost or duplicated: ${streamRows.size}")
      assert(batchRows.size === rounds * 5,
        s"batch commits lost under the racing sink: ${batchRows.size}")
    } finally if (q.isActive) q.stop()
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
    // reader/writer handshake: without it, on a fast (or slow) machine
    // all reads can land before the first upsert or after the last and
    // the torn-snapshot assertion passes vacuously. The upserter bumps
    // `done` per committed round and then BLOCKS until the reader has
    // acked a read at-or-after that round, so every round is observed
    // while the appender and compactor are still racing.
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val acked = new java.util.concurrent.atomic.AtomicInteger(0)
    val upserter = Future {
      (0 until rounds).foreach { r =>
        retrying(s"upsert r$r") {
          GraftTable.load(spark, dir).rowDelta(
            spark.range(1, 11).select(col("id").as("k")),
            spark.range(1, 11).select(col("id").as("k"), lit(s"u$r").as("v")),
            Seq("k"))
        }
        done.set(r + 1)
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (acked.get < r + 1 && System.nanoTime() < deadline)
          Thread.sleep(5)
      }
    }
    val compactor = Future {
      (0 until rounds).foreach { _ =>
        retrying("compact") { GraftTable.load(spark, dir).compact() }
      }
    }
    val reader = Future {
      var torn = List.empty[String]
      // keep reading until a read has been acked at-or-after the LAST
      // upsert round — guarantees ≥1 read lands after every round while
      // the other writers still race (see handshake comment above)
      while (acked.get < rounds) {
        // snapshot done BEFORE the read: a read that started before the
        // round committed must not ack it (the ack means "I read the
        // table at-or-after this round landed")
        val d0 = done.get
        val rows = GraftTable.load(spark, dir).toDF
          .filter(col("k") <= 10).select("k", "v").as[(Long, String)]
          .collect()
        // snapshot atomicity: one upsert round visible across ALL keys
        if (rows.map(_._2).distinct.length != 1)
          torn ::= rows.sortBy(_._1).mkString(",")
        if (rows.length != 10)
          torn ::= s"saw ${rows.length} of 10 upserted keys"
        acked.set(d0)
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

  test("schema/spec evolution racing data writers: metadata-only commits rebase over data commits") {
    // VERDICT r7 item 6: the OCC rebase of a METADATA-only commit
    // (addColumn / updateSpec) against a racing DATA commit was
    // untested. Four concurrent actors over one table:
    //   appender   — one new row per round
    //   upserter   — rowDelta over the seed keys each round
    //   schemaEvol — addColumn c0..c{rounds-1}
    //   specEvol   — updateSpec bucket(k, 2+r) each round
    // Postconditions: every added column present exactly once, the last
    // spec wins, no appended row or upsert lost, seed rows read back
    // with NULL in every post-hoc column.
    import graft.table.PartitionField
    val dir = TestSpark.tmpDir("gt-hammer-ddl")
    val t0 = GraftTable.create(spark, dir, schema, key = Seq("k"))
    t0.append(spark.range(1, 11).select(col("id").as("k"), lit("seed").as("v")))
    t0.upgradeFormat(2)
    val rounds = 4

    val appender = Future {
      (0 until rounds).foreach { r =>
        retrying(s"append r$r") {
          GraftTable.load(spark, dir)
            .append(Seq((2000L + r, s"a$r")).toDF("k", "v"))
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
    val schemaEvol = Future {
      (0 until rounds).foreach { r =>
        retrying(s"addColumn c$r") {
          GraftTable.load(spark, dir).addColumn(s"c$r", LongType)
        }
      }
    }
    val specEvol = Future {
      (0 until rounds).foreach { r =>
        retrying(s"updateSpec r$r") {
          GraftTable.load(spark, dir)
            .updateSpec(Seq(PartitionField("k", "bucket", 2 + r)))
        }
      }
    }
    Await.result(
      Future.sequence(Seq(appender, upserter, schemaEvol, specEvol)),
      300.seconds)

    val fin = GraftTable.load(spark, dir)
    val cols = fin.toDF.schema.fieldNames.toSeq
    assert(cols.count(_ == "k") == 1 && cols.count(_ == "v") == 1)
    (0 until rounds).foreach(r =>
      assert(cols.count(_ == s"c$r") == 1,
        s"column c$r appears ${cols.count(_ == s"c$r")} times in $cols"))
    assert(fin.spec == Seq(PartitionField("k", "bucket", 2 + rounds - 1)),
      s"final spec drifted: ${fin.spec}")
    val rows = fin.toDF.select(
        Seq(col("k"), col("v")) ++
          (0 until rounds).map(r => col(s"c$r").isNull.as(s"n$r")): _*)
      .collect()
    assert(rows.length == 10 + rounds, s"row count drifted: ${rows.length}")
    val byKey = rows.map(r => r.getLong(0) -> r).toMap
    (0 until rounds).foreach(r =>
      assert(byKey(2000L + r).getString(1) == s"a$r", s"append round $r lost"))
    (1L to 10L).foreach(k =>
      assert(byKey(k).getString(1) == s"u${rounds - 1}",
        s"key $k = ${byKey(k).getString(1)}, expected u${rounds - 1}"))
    rows.foreach(r => (0 until rounds).foreach(c =>
      assert(r.getBoolean(2 + c), s"post-hoc column c$c non-NULL for k=${r.getLong(0)}")))
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

  test("WAP stage/publish racing appends and tags: published rows land exactly " +
    "once, aborted stages leave no trace, no orphans afterwards") {
    val dir = TestSpark.tmpDir("gt-wap-hammer")
    val t0 = GraftTable.create(spark, dir, schema, key = Seq("k"))
    t0.append(spark.range(1, 6).select(col("id").as("k"), lit("seed").as("v")))
    t0.upgradeFormat(2)
    val rounds = 4

    // WAP writer: stage every round, publish even rounds, abort odd ones.
    // stage writes data + a marker with NO commit; publish is a metadata
    // commit and must fold through OCC rebase over the racing appender.
    val wapper = Future {
      (0 until rounds).map { r =>
        val t = GraftTable.load(spark, dir)
        val id = t.stageAppend(Seq((2000L + r, s"w$r")).toDF("k", "v"))
        assert(t.stagedDF(id).count() == 1L, s"stage r$r: audit saw wrong rows")
        if (r % 2 == 0) { retrying(s"publish r$r")(GraftTable.load(spark, dir).publishStaged(id)); true }
        else { GraftTable.load(spark, dir).abortStaged(id); false }
      }
    }
    val appender = Future {
      (0 until rounds).foreach { r =>
        retrying(s"append r$r") {
          GraftTable.load(spark, dir).append(Seq((3000L + r, s"a$r")).toDF("k", "v"))
        }
      }
    }
    // metadata racer: tags pin whatever version is current when they fire
    val tagger = Future {
      (0 until rounds).map { r =>
        val live = GraftTable.load(spark, dir)
        val v = live.currentVersion
        live.createTag(s"hammer_t$r", v)
        (s"hammer_t$r", v)
      }
    }

    val published = Await.result(wapper, 300.seconds)
    Await.result(appender, 300.seconds)
    val tags = Await.result(tagger, 300.seconds)

    val fin = GraftTable.load(spark, dir)
    val byKey = fin.toDF.as[(Long, String)].collect().toMap
    (0 until rounds).foreach { r =>
      if (published(r))
        assert(byKey.get(2000L + r).contains(s"w$r"), s"published stage r$r lost")
      else
        assert(!byKey.contains(2000L + r), s"aborted stage r$r leaked into reads")
      assert(byKey.get(3000L + r).contains(s"a$r"), s"append r$r lost")
    }
    assert(byKey.size == 5 + rounds + published.count(identity),
      s"row count drifted: ${byKey.size}")
    // every stage was consumed (published or aborted): no markers remain,
    // and a zero-grace orphan sweep right after the race finds NOTHING —
    // aborts removed their dirs, publishes are referenced, nothing leaks
    assert(fin.stagedIds.isEmpty, s"unconsumed stages: ${fin.stagedIds}")
    val swept = fin.vacuumOrphans(olderThanMs = -1000)
    assert(swept.isEmpty, s"race leaked orphans: $swept")
    assert(GraftTable.load(spark, dir).toDF.as[(Long, String)].collect().toMap == byKey,
      "vacuum after the race changed query results")
    // tags pin real versions and replay cleanly (content probe on one)
    tags.foreach { case (name, v) => assert(fin.refOf(name).version == v) }
    val (n0, v0) = tags.head
    assert(fin.asOfRef(n0).count() >= 5, s"tag $n0 at v$v0 lost the seed rows")
  }
}
