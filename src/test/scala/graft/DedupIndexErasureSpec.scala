package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Erasure from the governed dedup index ([[graft.ext.TextOps.dedupIndexErasure]]):
  * the oracle hashes the post-erasure probe values; these pin the LAWS the
  * oracle cannot see — erasure is exactly a corpus restriction of the
  * un-erased probe (no collateral damage to surviving pairs), and the
  * cohort is non-vacuous at test SF. */
class DedupIndexErasureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  test("erasure ≡ the un-erased probe restricted to surviving corpus docs") {
    val erased = ext.TextOps.queries("dedup_index_erasure")(spark, dir).collect()
    val full = ext.TextOps.queries("dedup_index_probe")(spark, dir).collect()
    // the law: deleting a cohort from the index removes EXACTLY the pairs
    // whose corpus side is in the cohort — every surviving pair keeps its
    // jaccard bit-for-bit (erasure is metadata-only, never a re-score)
    val expected = full.filter(r => r.getLong(1) % 13 != 7)
    assert(erased.length == expected.length,
      s"${erased.length} pairs vs expected ${expected.length}")
    erased.zip(expected).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
    // non-vacuous: the cohort actually removed matches at this SF
    assert(erased.length < full.length,
      "erasure cohort intersects no matches — vacuous fixture")
  }

  test("erasure becomes PHYSICAL after compact + expireSnapshots + vacuum: " +
    "no version and no surviving byte serves the erased docs") {
    import graft.table.GraftTable
    import graft.ext.TextOps
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    // a fresh index over the corpus split (never the shared cached base —
    // this test mutates and expires it)
    val docs = TextOps.md5DocSets(
      graft.ops.Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("text"))
        .filter(col("source") =!= "src0"))
    val idx = TextOps.createDedupIndex(spark)
    TextOps.appendDedupIndex(spark, idx, docs)
    val erasedIds = docs.filter(col("doc_id") % 13 === 7)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(erasedIds.nonEmpty, "vacuous erasure cohort")
    val preV = GraftTable.load(spark, idx.bandsDir).currentVersion
    Seq(idx.bandsDir, idx.repsDir).foreach { d =>
      GraftTable.load(spark, d).upgradeFormat(2)
      GraftTable.load(spark, d).rowDelta(
        erasedIds.toSeq.toDF("doc_id"),
        GraftTable.load(spark, d).toDF.limit(0), Seq("doc_id"))
    }
    // CORRECT snapshot semantics, WRONG GDPR answer: before expiry a
    // time-travel read still serves the erased docs
    val ghostsPre = GraftTable.load(spark, idx.bandsDir).asOf(preV)
      .filter(col("doc_id").isInCollection(erasedIds.toSeq)).count()
    assert(ghostsPre > 0, "pre-erasure snapshot should still hold the cohort")
    // the GDPR closer: compact (live rows only), PUBLISH the compacted
    // state, expire the manifest's own history (so no live manifest row
    // names a pre-erasure version), release the now-unreferenced
    // retention pins, THEN expire + vacuum the content tables — the
    // erased rows AND the delete files that name them must leave the
    // filesystem. Without the pin release, the publish-time tags
    // (which exist to keep published history servable across
    // expireSnapshots) would veto the right to be forgotten.
    Seq(idx.bandsDir, idx.repsDir).foreach(d =>
      GraftTable.load(spark, d).compact())
    TextOps.publishDedupManifest(spark, idx)
    GraftTable.load(spark, idx.manifestDir).expireSnapshots(1)
    TextOps.releaseUnreferencedPins(spark, idx)
    Seq(idx.bandsDir, idx.repsDir).foreach { d =>
      GraftTable.load(spark, d).expireSnapshots(1)
      GraftTable.load(spark, d).vacuumOrphans(0)
    }
    Seq(idx.bandsDir, idx.repsDir).foreach { d =>
      // (a) every pre-compaction version fails CLEANLY — "expired", never
      // a file-not-found or a successful read of erased rows
      (0 until GraftTable.load(spark, d).currentVersion).foreach { v =>
        val e = intercept[Exception] {
          GraftTable.load(spark, d).asOf(v).collect()
        }
        assert(e.getMessage.contains("expired"),
          s"asOf($v) of $d failed with '${e.getMessage}' instead of expired")
      }
      // (b) no surviving parquet byte under the table dir — data files
      // OR delete files (which name the forgotten keys!) — contains an
      // erased doc_id
      val leaked = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
        .filter(p => p.toString.endsWith(".parquet"))
        .iterator().asScala.map(_.toString).toSeq
        .map { f =>
          val df = spark.read.parquet(f)
          if (!df.columns.contains("doc_id")) 0L
          else df.filter(col("doc_id").isInCollection(erasedIds.toSeq)).count()
        }.sum
      assert(leaked == 0, s"$leaked erased-doc rows survive on disk under $d")
    }
  }
}
