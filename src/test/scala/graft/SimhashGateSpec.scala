package graft

import org.scalatest.funsuite.AnyFunSuite

/** The gated simhash query must pass its own recall invariant on the
  * fixtures (the gate throws if chunk banding loses a provably-kept
  * pair), and keep the ungated query's row shape. */
class SimhashGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("gated dedup_simhash passes its recall invariant and matches the ungated pairs") {
    val dir = "/root/testdata/sf0.001"
    val gated = graft.ext.TextOps.queries("dedup_simhash")(spark, dir)
      .collect().map(_.toSeq).toSet
    val plain = graft.ext.TextOps.dedupSimhash(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(gated == plain, "gating must not change the pair list")
    assert(gated.nonEmpty)
  }
}
