package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable
import graft.ext.TextOps

/** Retention vs manifest pins (VERDICT r13 item 2 — the Iceberg
  * GC-vs-branch problem): `expireSnapshots` on a content table knows
  * nothing about manifests, so before this round a re-banding refresh
  * followed by an expiry could garbage-collect the bands version the
  * pre-refresh manifest still names — a pinned reader would fail with
  * file-not-found mid-serve. The fix mirrors Iceberg's rule that tags
  * exempt snapshots from expiry: every manifest PUBLISH tag-pins the
  * versions it names (`pin-v<N>`), expiry honors refs, and the pins are
  * released only when no live manifest snapshot names them
  * ([[TextOps.releaseUnreferencedPins]] — which is what keeps the pins
  * from vetoing GDPR physical erasure, see DedupIndexErasureSpec).
  */
class DedupIndexRetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("expiry mid-lifecycle keeps every manifest-named version servable; " +
    "released pins make it reclaimable") {
    import spark.implicits._
    val text = (1 to 30).map(i => s"tok$i").mkString(" ")
    def docsOf(ids: Seq[Long]) =
      TextOps.md5DocSets(ids.map(id => (id, text)).toDF("doc_id", "text"))
    val idx = TextOps.createDedupIndex(spark, k = 64, bands = 2)
    val probeBatch = docsOf(Seq(1000L)).localCheckpoint(true)

    // two RAW appends (no publish) — v1 stays unpinned, the control that
    // proves expiry really runs — then one publish pinning v2
    val sigAll = TextOps.md5BandedSignature(docsOf(Seq(0L, 1L, 2L)), 64, 2)
    GraftTable.load(spark, idx.bandsDir)
      .append(sigAll.filter(col("doc_id") === 0).select(col("band"), col("bh"), col("doc_id")))
    GraftTable.load(spark, idx.bandsDir)
      .append(sigAll.filter(col("doc_id") =!= 0).select(col("band"), col("bh"), col("doc_id")))
    GraftTable.load(spark, idx.repsDir).append(
      docsOf(Seq(0L, 1L, 2L)).select(col("doc_id"), col("htoks")))
    TextOps.publishDedupManifest(spark, idx)
    val manPreV = GraftTable.load(spark, idx.manifestDir).currentVersion
    val bandsPreV = GraftTable.load(spark, idx.bandsDir).currentVersion
    val pre = TextOps.probeDedupIndex(spark, idx, probeBatch, 0.9).collect().toSeq
    assert(pre.map(_.getLong(1)).sorted == Seq(0L, 1L, 2L), s"fixture broken: $pre")

    // the RE-BANDING refresh: staged overwrite (replaces the old dirs —
    // exactly what an unpinned expiry would reclaim), then the cutover
    GraftTable.load(spark, idx.bandsDir).overwrite(
      TextOps.md5BandedSignature(docsOf(Seq(0L, 1L, 2L)), 64, 8)
        .select(col("band"), col("bh"), col("doc_id")))
    TextOps.publishDedupManifestAt(spark, idx.copy(bands = 8), 64, 8,
      GraftTable.load(spark, idx.bandsDir).currentVersion,
      GraftTable.load(spark, idx.repsDir).currentVersion)

    // EXPIRE MID-LIFECYCLE. The unpinned v1 must actually expire (the
    // sweep ran); the manifest-named bandsPreV must survive WITH its data.
    GraftTable.load(spark, idx.bandsDir).expireSnapshots(1)
    GraftTable.load(spark, idx.bandsDir).vacuumOrphans(0)
    val e = intercept[Exception] {
      GraftTable.load(spark, idx.bandsDir).asOf(1).collect()
    }
    assert(e.getMessage.contains("expired"),
      s"unpinned v1 should have expired, got '${e.getMessage}'")
    // a reader pinned to the pre-refresh manifest still serves the EXACT
    // old answer — old banding params against the old (pinned) content
    val pinned = TextOps.probeDedupIndex(spark, idx, probeBatch, 0.9,
      manifestV = Some(manPreV)).collect().toSeq
    assert(pinned == pre,
      "pinned-manifest probe diverged after mid-lifecycle expiry — retention " +
        "reclaimed a version a live manifest still names")

    // RELEASE: expire the manifest's own history, drop unreferenced pins,
    // expire again — now the pre-refresh version is reclaimable and reads
    // of it fail CLEANLY as expired (never file-not-found)
    GraftTable.load(spark, idx.manifestDir).expireSnapshots(1)
    TextOps.releaseUnreferencedPins(spark, idx)
    GraftTable.load(spark, idx.bandsDir).expireSnapshots(1)
    GraftTable.load(spark, idx.bandsDir).vacuumOrphans(0)
    val e2 = intercept[Exception] {
      GraftTable.load(spark, idx.bandsDir).asOf(bandsPreV).collect()
    }
    assert(e2.getMessage.contains("expired"),
      s"released pre-refresh version should read as expired, got '${e2.getMessage}'")
    // the CURRENT published state still serves
    val post = TextOps.probeDedupIndex(spark, idx, probeBatch, 0.9).collect()
    assert(post.map(_.getLong(1)).sorted.toSeq == Seq(0L, 1L, 2L),
      "current published state broke after pin release + expiry")
  }
}
