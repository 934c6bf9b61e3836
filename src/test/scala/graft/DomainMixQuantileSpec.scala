package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-phase quantile-cutoff domain mix must select the IDENTICAL
  * document set as the doc-level greedy ([[graft.ext.CorpusOps.domainMix]])
  * — the law its DuckDB oracle checks on the fixtures, stress-tested here
  * on a synthetic corpus built to make the bin decomposition hard:
  * few sources (so each md5-prefix bin holds many docs), a cap that
  * lands mid-bin, plus an exhausted source (cap smaller than the first
  * bin) and an unexhausted source (cap larger than everything).
  */
class DomainMixQuantileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("two-phase selection == doc-level greedy on a skewed synthetic corpus") {
    val dir = TestSpark.tmpDir("dmq").stripSuffix("/t")
    // cap derives from the source id digits: src0→1000, src1→1500,
    // src2→2000, src3→2500 chars. n_chars chosen so src0's cap lands
    // mid-bin (docs of 37 chars → ~27 admitted of 4000), src1 admits a
    // handful of big docs, src3's 2500 swallows its whole tiny corpus.
    val rows =
      (0 until 4000).map(i => (i.toLong, "src0", 37L)) ++
        (0 until 300).map(i => (10000L + i, "src1", 400L)) ++
        (0 until 3000).map(i => (20000L + i, "src2", 1L)) ++
        (0 until 3).map(i => (30000L + i, "src3", 10L))
    rows.toDF("doc_id", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val fast = graft.ext.CorpusOps.queries("domain_mix_quantile")(spark, dir)
      .select("doc_id", "selected").as[(Long, Boolean)].collect().toMap
    val slow = graft.ext.CorpusOps.queries("domain_mix")(spark, dir)
      .select("doc_id", "selected").as[(Long, Boolean)].collect().toMap
    assert(fast.size == rows.size && slow.size == rows.size)
    val diff = rows.map(_._1).filter(id => fast(id) != slow(id))
    assert(diff.isEmpty,
      s"two-phase disagrees with greedy on ${diff.size} docs, e.g. ${diff.take(5)}")
    // the scenario is non-trivial: every source has at least one
    // selected doc, and src0/src2 both have rejections (cap exhausted)
    val bySrc = rows.groupBy(_._2).map { case (s, rs) =>
      s -> rs.count(r => fast(r._1)) }
    assert(bySrc.values.forall(_ > 0), s"vacuous scenario: $bySrc")
    assert(bySrc("src0") < 4000 && bySrc("src2") < 3000, s"no rejections: $bySrc")
    assert(bySrc("src3") == 3, "unexhausted source must admit everything")
  }
}
