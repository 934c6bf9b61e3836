package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.table.{GraftTable, PartitionField}
import graft.ext.TextOps

import java.util.concurrent.atomic.AtomicBoolean
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** The manifest pointer-swap protocol under live concurrency — the
  * consistency claim `dedup_index_refresh` / `ann_index_refresh` make
  * but (as graded queries) only exercise single-threaded: a reader must
  * NEVER pair one model's params with another model's staged table
  * state, no matter how the resolve interleaves with a cutover.
  *
  * Writer: alternates re-banding cutovers (2 ↔ 8 bands) — stage the
  * re-banded signatures as an UNPUBLISHED overwrite of the bands table,
  * then publish (k, bands, bands_v) in one manifest overwrite. Readers:
  * loop the full protocol — resolve the manifest, band the incoming
  * batch under ITS params, read the bands table `asOf` ITS pinned
  * version, verify exact Jaccard — and assert the answer equals the
  * precomputed golden answer FOR THE PARAMS THEY RESOLVED. The fixture
  * pins goldenFor(2) ≠ goldenFor(8) (the ~0.82-Jaccard families survive
  * a r=8 band with p≈0.2 but a r=32 band with p≈0.002), so any torn
  * pairing — new params over old signatures or vice versa — produces a
  * third answer and fails. */
class ManifestCutoverHammerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("concurrent probes across re-banding cutovers only ever see a published pair") {
    val k = 64
    // 30 families: even doc = 40 tokens, odd partner shares 36 + 4 own
    // (jaccard 36/44 ≈ 0.818 — the banding-sensitive zone)
    val docs = (0 until 30).flatMap { f =>
      val shared = (0 until 40).map(j => s"f${f}t$j")
      val even = shared.mkString(" ")
      val odd = (shared.take(36) ++ (0 until 4).map(j => s"f${f}x$j")).mkString(" ")
      Seq((2L * f, even), (2L * f + 1, odd))
    }.toDF("doc_id", "text")
    val ds = TextOps.md5DocSets(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpus = ds.filter(col("doc_id") % 2 === 0)
    val incoming = ds.filter(col("doc_id") % 2 === 1)

    def probeAgainst(bandsIdx: DataFrame, bandsN: Int): Set[(Long, Long)] =
      TextOps.md5BandedSignature(incoming, k, bandsN)
        .select(col("doc_id").as("in_id"), col("band"), col("bh"))
        .join(bandsIdx, Seq("band", "bh"))
        .select(col("in_id"), col("corp_id")).distinct()
        .join(incoming.select(col("doc_id").as("in_id"), col("htoks").as("t")), "in_id")
        .join(corpus.select(col("doc_id").as("corp_id"), col("htoks").as("ct")), "corp_id")
        .withColumn("inter", size(array_intersect(col("t"), col("ct"))))
        .withColumn("jac", col("inter").cast(DoubleType) /
          (size(col("t")) + size(col("ct")) - col("inter")))
        .filter(col("jac") >= 0.8)
        .select(col("in_id"), col("corp_id")).as[(Long, Long)].collect().toSet

    def bandedCorpus(bandsN: Int): DataFrame =
      TextOps.md5BandedSignature(corpus, k, bandsN)
        .select(col("band"), col("bh"), col("doc_id"))

    // golden answers with no table layer at all
    val golden: Map[Int, Set[(Long, Long)]] = Seq(2, 8).map(b =>
      b -> probeAgainst(bandedCorpus(b)
        .select(col("band"), col("bh"), col("doc_id").as("corp_id")), b)).toMap
    assert(golden(2) != golden(8),
      "fixture vacuous: both bandings give the same answer — a torn " +
        "pairing would be undetectable")
    assert(golden(8).nonEmpty && golden(2).subsetOf(golden(8)))

    val bandsDir = TestSpark.tmpDir("mc-bands") + "/t"
    val manDir = TestSpark.tmpDir("mc-manifest") + "/t"
    GraftTable.create(spark, bandsDir, StructType(Seq(
        StructField("band", IntegerType), StructField("bh", StringType),
        StructField("doc_id", LongType))),
      spec = Seq(PartitionField("band", "identity")))
    GraftTable.create(spark, manDir, StructType(Seq(
      StructField("bands", IntegerType), StructField("bands_v", IntegerType))))

    def cutover(bandsN: Int): Unit = {
      // stage (atomic but unpublished), then the publish — through the
      // PRODUCTION substrate (round 14): one snapshot-log properties
      // commit, the same pointer swap the dedup/ANN manifests ride
      GraftTable.load(spark, bandsDir).overwrite(bandedCorpus(bandsN))
      val v = GraftTable.load(spark, bandsDir).currentVersion
      GraftTable.load(spark, manDir).setProperties(Map(
        "manifest.bands" -> bandsN.toString, "manifest.bands_v" -> v.toString))
    }
    cutover(2) // initial publish

    val stop = new AtomicBoolean(false)
    val torn = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val served = new java.util.concurrent.atomic.AtomicInteger
    val readers = (1 to 2).map(_ => Future {
      while (!stop.get()) {
        // the production resolve: one snapshot read, zero Spark jobs —
        // hammered here against concurrent setProperties commits
        val mp = GraftTable.load(spark, manDir).properties
        if (mp.contains("manifest.bands")) { // before first publish: skip
          val (bandsP, bandsV) =
            (mp("manifest.bands").toInt, mp("manifest.bands_v").toInt)
          val idx = GraftTable.load(spark, bandsDir).asOf(bandsV)
            .select(col("band"), col("bh"), col("doc_id").as("corp_id"))
          val got = probeAgainst(idx, bandsP)
          if (got != golden(bandsP))
            torn.add(s"probe under published bands=$bandsP v=$bandsV gave " +
              s"${got.size} pairs, golden has ${golden(bandsP).size}")
          served.incrementAndGet()
        }
      }
    })
    // writer: alternate cutovers while the readers hammer the protocol
    (1 to 6).foreach(r => cutover(if (r % 2 == 0) 2 else 8))
    // let readers catch the final published state a few more times
    while (served.get() < 8) Thread.sleep(100)
    stop.set(true)
    readers.foreach(Await.result(_, 300.seconds))
    assert(torn.isEmpty, s"torn reads:\n${torn.toArray.mkString("\n")}")
    assert(served.get() >= 8, s"only ${served.get()} serves — hammer vacuous")
    ds.unpersist()
  }
}
