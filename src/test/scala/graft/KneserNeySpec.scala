package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.CorpusOps

/** Interpolated Kneser-Ney: the distribution law (Σ_w P(w|v) = 1 over
  * the full vocabulary, for every context) recomputed driver-side from
  * a tiny corpus, and the scored bits matching a by-hand replication. */
class KneserNeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val D = 0.75

  test("per-context probabilities sum to 1 and scored bits match a hand replication") {
    val texts = Seq(
      (0L, "a b a b c"),
      (1L, "a b c a"),
      (2L, "c c a b"))
    val dir = TestSpark.tmpDir("kn_spec")
    texts.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")

    // hand model
    val bigrams = texts.flatMap { case (id, t) =>
      val w = t.split(" "); w.init.zip(w.tail).map(p => (id, p._1, p._2)) }
    val c12 = bigrams.groupBy(b => (b._2, b._3)).map { case (k, v) => k -> v.size.toLong }
    val cctx = c12.groupBy(_._1._1).map { case (v, m) => v -> m.values.sum }
    val n1f = c12.groupBy(_._1._1).map { case (v, m) => v -> m.size.toLong }
    val n1r = c12.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val n1tot = c12.size.toLong
    val vocab = texts.flatMap(_._2.split(" ")).distinct
    def pcont(w: String) = n1r.getOrElse(w, 0L).toDouble / n1tot
    def p(v: String, w: String) =
      math.max(c12.getOrElse((v, w), 0L) - D, 0.0) / cctx(v) +
        D * n1f(v) / cctx(v) * pcont(w)

    // law: for every context v, Σ over the FULL vocab of P(w|v) == 1
    cctx.keys.foreach { v =>
      val s = vocab.map(w => p(v, w)).sum
      assert(math.abs(s - 1.0) < 1e-12, s"context '$v' sums to $s")
    }

    // scored bits match the engine (engine rounds per-bigram to 6 dp)
    val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
      val bits = bs.map { case (_, v, w) =>
        BigDecimal(-math.log(p(v, w)) / math.log(2.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
      id -> BigDecimal(bits.sum / bs.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = CorpusOps.kneserNeyScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got === expected)
  }
}
