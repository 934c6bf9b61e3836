package graft

import org.scalatest.funsuite.AnyFunSuite

/** Re-banding refresh of the governed dedup index
  * ([[graft.ext.TextOps.dedupIndexRefresh]]): the oracle hashes the
  * post-cutover probe; these pin the LAWS the oracle cannot see — the
  * published refreshed state is indistinguishable from an index built
  * directly at the new banding, and the recall upgrade is real (the
  * query's own `require`s already prove pinned readers keep the old
  * banding and that the matched set strictly grew). */
class DedupIndexRefreshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  test("post-refresh probe ≡ an index built directly at the new banding") {
    val refreshed = ext.TextOps.queries("dedup_index_refresh")(spark, dir).collect()
    val direct = ext.TextOps.queries("dedup_index_probe")(spark, dir).collect()
    // the law: after the 2→8-band cutover the served answer must be
    // bit-identical to the probe of an index that was BORN 8-banded —
    // staging from the built base and publishing via the manifest is a
    // pure physical path, never a semantic one
    assert(refreshed.length == direct.length,
      s"${refreshed.length} pairs vs direct ${direct.length}")
    refreshed.zip(direct).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
  }
}
