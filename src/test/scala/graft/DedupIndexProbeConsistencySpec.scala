package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable
import graft.ext.TextOps

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Snapshot-consistent reads across the PAIRED index tables (VERDICT r13
  * item 6): every probe resolves the manifest once and reads bands + reps
  * `asOf` the versions that ONE row names — never "latest" of either
  * table independently. The hammer: a writer appends corpus batches and,
  * mid-stream, performs a RE-BANDING cutover (the staged-overwrite +
  * manifest pointer-swap refresh protocol) while a reader loops full
  * probes. Every corpus doc is an exact dup (J=1.0) of the probe doc, so
  * the correct answer after batch j is EXACTLY {0..j-1}:
  *
  *  - zero dropped candidates: a probe that served bands of doc X with
  *    no reps row (the old twin-"latest"-load tear) would return a
  *    non-prefix set; a probe that banded the incoming doc under params
  *    different from the content it scanned (the cutover tear) would
  *    return {} after having seen a longer prefix;
  *  - prefix-monotone: the manifest only advances, so successive probe
  *    answers never shrink.
  */
class DedupIndexProbeConsistencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("probes racing appends + a re-banding cutover always serve an exact published prefix") {
    import spark.implicits._
    val text = (1 to 30).map(i => s"tok$i").mkString(" ")
    val nBatches = 8
    val cutAfter = 4 // re-band 2 -> 8 bands after this many batches
    val idx2 = TextOps.createDedupIndex(spark, k = 64, bands = 2)
    val idx8 = idx2.copy(bands = 8)
    def docsOf(ids: Seq[Long]) =
      TextOps.md5DocSets(ids.map(id => (id, text)).toDF("doc_id", "text"))
    val probeBatch = docsOf(Seq(1000L)).localCheckpoint(true)

    @volatile var writerDone = false
    val writer = Future {
      (0 until nBatches).foreach { j =>
        val handle = if (j < cutAfter) idx2 else idx8
        TextOps.appendDedupIndex(spark, handle, docsOf(Seq(j.toLong)))
        if (j == cutAfter - 1) {
          // the refresh cutover: stage the whole corpus re-banded at 8
          // bands as an (unpublished) overwrite, then swap the manifest
          val corpusSoFar = docsOf((0 until cutAfter).map(_.toLong))
          GraftTable.load(spark, idx2.bandsDir).overwrite(
            TextOps.md5BandedSignature(corpusSoFar, 64, 8)
              .select(col("band"), col("bh"), col("doc_id")))
          TextOps.publishDedupManifestAt(spark, idx8, 64, 8,
            GraftTable.load(spark, idx2.bandsDir).currentVersion,
            GraftTable.load(spark, idx2.repsDir).currentVersion)
        }
        Thread.sleep(200) // stretch the window so probes overlap commits
      }
      writerDone = true
    }

    var lastPrefix = 0
    var probes = 0
    try {
      while (!writerDone && probes < 500) {
        val got = TextOps.probeDedupIndex(spark, idx2, probeBatch, 0.9)
          .select(col("corp_id")).collect().map(_.getLong(0)).sorted.toSeq
        val j = got.length
        assert(got == (0 until j).map(_.toLong),
          s"probe $probes returned a NON-PREFIX set $got — dropped candidate / torn read")
        assert(j >= lastPrefix,
          s"probe $probes shrank: prefix $lastPrefix -> $j (served a pre-cutover " +
            "banding against post-cutover content, or regressed the manifest)")
        lastPrefix = j
        probes += 1
      }
    } finally Await.result(writer, 600.seconds)
    // the quiesced index serves the full corpus
    val fin = TextOps.probeDedupIndex(spark, idx2, probeBatch, 0.9)
      .select(col("corp_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(fin == (0 until nBatches).map(_.toLong),
      s"final probe saw $fin instead of the full ${nBatches}-doc corpus")
    assert(probes >= 3, s"only $probes concurrent probes ran — hammer too weak to mean anything")
    info(s"$probes concurrent probes, all exact published prefixes (final=$lastPrefix)")
  }
}
