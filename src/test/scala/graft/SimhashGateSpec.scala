package graft

import org.scalatest.funsuite.AnyFunSuite

/** The gated simhash queries must pass their own completeness invariant
  * on the fixtures (the gate throws if chunk banding loses a provably-
  * kept pair). Two flavors share the banding + gate machinery: the
  * md5-construction GRADED query (oracle-hashed) and the XXH64
  * production path (this spec's driver-independent coverage). */
class SimhashGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("graded md5 dedup_simhash passes its completeness gate and emits pairs") {
    val dir = "/root/testdata/sf0.001"
    val gated = graft.ext.TextOps.queries("dedup_simhash")(spark, dir).collect()
    assert(gated.nonEmpty)
    assert(gated.forall(_.getInt(2) <= 3), "pairs must be within maxHamming")
  }

  test("xxh64 golden vectors: every mixer output matches its pinned value") {
    // engine-side twin of the xxh64_vectors DuckDB oracle: the custom
    // MinHash/SimHash expressions, Spark's xxhash64, and the driver
    // replica must reproduce the frozen 64-bit constants exactly — a
    // drifted mixer would silently re-band a 100 TB corpus
    val got = graft.ext.TextOps.xxh64VectorsQuery(spark, "unused")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == graft.ext.TextOps.xxh64GoldenVectors.sortBy(_._1),
      "xxh64 mixer output drifted from the pinned golden vectors")
  }

  test("XXH64 gated minhash-LSH passes its containment invariant") {
    val dir = "/root/testdata/sf0.001"
    val gated = graft.ext.TextOps.minhashGatedQuery(spark, dir).collect()
    assert(gated.nonEmpty)
    assert(gated.forall(_.getDouble(2) >= 0.8), "pairs must clear the verify threshold")
  }

  test("XXH64 gated simhash passes its invariant and matches the ungated pairs") {
    val dir = "/root/testdata/sf0.001"
    val gated = graft.ext.TextOps.simhashGatedQuery(spark, dir)
      .collect().map(_.toSeq).toSet
    val plain = graft.ext.TextOps.dedupSimhash(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(gated == plain, "gating must not change the pair list")
    assert(gated.nonEmpty)
  }
}
