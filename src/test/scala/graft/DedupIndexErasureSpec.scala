package graft

import org.scalatest.funsuite.AnyFunSuite

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
}
