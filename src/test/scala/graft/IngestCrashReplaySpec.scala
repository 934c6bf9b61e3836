package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable
import graft.ext.TextOps
import graft.streaming.StreamOps

/** Crash-safety of the ingest loop's MULTI-TABLE commit (VERDICT r13
  * item 1): one micro-batch of `stream_ingest_dedup` commits to FOUR
  * tables — admitted corpus, index bands, index reps, index manifest —
  * each gated by its own `(consumerId.<step>, batchId)` streamEpochs
  * ledger. The two laws a post-crash Spark foreachBatch replay needs:
  *
  *  - a replay of a FULLY-committed batch is a no-op on all four tables
  *    (no double-append, no manifest double-bump);
  *  - a replay after a crash BETWEEN the commits resumes at the first
  *    uncommitted step and CONVERGES: the final corpus + index state is
  *    byte-identical to a run that never crashed. Determinism holds
  *    because the replayed probe reads the index through the MANIFEST,
  *    which only advances as the batch's last step — the crashed batch's
  *    partial appends are invisible to it.
  */
class IngestCrashReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"
  private val threshold = 0.9

  private def docs = graft.ops.Tables.documents(spark, dir)
    .select(col("doc_id"), col("text"))

  private def batch(s: Int) = docs.filter(col("doc_id") % 3 === s)

  private def mkCorpus(): GraftTable =
    GraftTable.create(spark, TestSpark.tmpDir("ingest-replay-corpus"), docs.schema)

  private def state(corpusDir: String, idx: TextOps.DedupIndex): Seq[Int] =
    Seq(corpusDir, idx.bandsDir, idx.repsDir, idx.manifestDir)
      .map(d => GraftTable.load(spark, d).currentVersion)

  private def admitted(corpusDir: String): Seq[(Long, String)] =
    GraftTable.load(spark, corpusDir).toDF
      .select(col("doc_id"), md5(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq

  test("replaying a fully-committed batch no-ops on all four tables") {
    val idx = TextOps.createDedupIndex(spark)
    val corpus = mkCorpus()
    (0 until 3).foreach(i =>
      StreamOps.ingestDedupBatch(batch(i), corpus.dir, idx, "cid", i, threshold))
    val vPre = state(corpus.dir, idx)
    val rowsPre = admitted(corpus.dir)
    // the replay: same consumerId, same batchId, same content
    StreamOps.ingestDedupBatch(batch(1), corpus.dir, idx, "cid", 1, threshold)
    assert(state(corpus.dir, idx) == vPre,
      s"replay advanced a table: $vPre -> ${state(corpus.dir, idx)}")
    assert(admitted(corpus.dir) == rowsPre, "replay changed the corpus content")
  }

  test("a crash between the corpus commit and the index commits converges on replay") {
    // CLEAN reference run
    val idxC = TextOps.createDedupIndex(spark)
    val corpusC = mkCorpus()
    (0 until 3).foreach(i =>
      StreamOps.ingestDedupBatch(batch(i), corpusC.dir, idxC, "cid", i, threshold))
    val cleanRows = admitted(corpusC.dir)
    val cleanBands = GraftTable.load(spark, idxC.bandsDir).toDF.count()
    val cleanReps = GraftTable.load(spark, idxC.repsDir).toDF.count()

    // CRASHED run: batch 0 lands fully; batch 1 "crashes" after ONLY the
    // corpus commit (the first of the four steps)
    val idx = TextOps.createDedupIndex(spark)
    val corpus = mkCorpus()
    StreamOps.ingestDedupBatch(batch(0), corpus.dir, idx, "cid", 0, threshold)
    locally {
      val b1 = batch(1)
      val ds = TextOps.md5DocSets(b1)
      val sig = TextOps.md5BandedSignature(ds, idx.k, idx.bands)
      val ht = ds.select(col("doc_id"), col("htoks"))
      val dupIds = TextOps.probeDedupIndexSig(spark, idx, sig, ht, threshold)
        .select(col("in_id").as("doc_id")).distinct()
      val liveIds = ht.select(col("doc_id")).join(dupIds, Seq("doc_id"), "left_anti")
      GraftTable.load(spark, corpus.dir).streamEpochWrite(
        b1.join(liveIds, Seq("doc_id"), "left_semi"),
        "cid.corpus", 1L, replace = false)
      // crash: bands/reps/manifest never commit — index ≠ corpus here
    }
    val tornCorpus = GraftTable.load(spark, corpus.dir).currentVersion
    // REPLAY batch 1 in full (the foreachBatch contract: a failed batch
    // re-runs before any later batch), then batch 2
    StreamOps.ingestDedupBatch(batch(1), corpus.dir, idx, "cid", 1, threshold)
    assert(GraftTable.load(spark, corpus.dir).currentVersion == tornCorpus,
      "replay double-appended the corpus (its ledger already had batch 1)")
    StreamOps.ingestDedupBatch(batch(2), corpus.dir, idx, "cid", 2, threshold)

    assert(admitted(corpus.dir) == cleanRows,
      "crashed+replayed run's admitted corpus diverged from the clean run")
    assert(GraftTable.load(spark, idx.bandsDir).toDF.count() == cleanBands,
      "crashed+replayed run's bands table diverged from the clean run")
    assert(GraftTable.load(spark, idx.repsDir).toDF.count() == cleanReps,
      "crashed+replayed run's reps table diverged from the clean run")
    // the healed index serves the same probe answer as the clean one
    val probeBatch = TextOps.md5DocSets(docs.limit(40))
    def ans(i: TextOps.DedupIndex) =
      TextOps.probeDedupIndex(spark, i, probeBatch, threshold).collect().toSeq
    assert(ans(idx) == ans(idxC),
      "healed index's probe answer diverged from the clean index")
  }
}
