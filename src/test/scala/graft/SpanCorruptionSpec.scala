package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.CorpusOps

/** T5 span corruption: the denoising-pair law — splicing each target
  * span back over its sentinel in the input reconstructs the original
  * document exactly. Plus structural invariants: sequential sentinel
  * ids, span lengths ≥ 2 before merging can only grow them, and the
  * masked fraction lands near the 15% design point. */
class SpanCorruptionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  private val sentinel = "<extra_id_(\\d+)>".r

  test("input + target splice back to the original text for every doc") {
    val out = CorpusOps.spanCorruption(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val originals = graft.ops.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet === originals.keySet)
    originals.foreach { case (id, text) =>
      val (in, tg) = out(id)
      // target: "<extra_id_0> tok tok <extra_id_1> tok ..." → span map
      val spans = scala.collection.mutable.Map.empty[Int, List[String]]
      var cur = -1
      tg.split(" ").filter(_.nonEmpty).foreach {
        case sentinel(k) => cur = k.toInt; spans(cur) = Nil
        case tok => spans(cur) = spans(cur) :+ tok
      }
      val rebuilt = in.split(" ").filter(_.nonEmpty).flatMap {
        case sentinel(k) => spans(k.toInt)
        case tok => Seq(tok)
      }.mkString(" ")
      assert(rebuilt === text, s"doc $id does not reconstruct")
    }
  }

  test("sentinels are sequential from 0 and masked fraction is near 15%") {
    val rows = CorpusOps.spanCorruption(spark, sfDir).collect()
    var masked = 0L; var total = 0L
    rows.foreach { r =>
      val nSpans = r.getLong(3)
      val ids = sentinel.findAllMatchIn(r.getString(1)).map(_.group(1).toInt).toSeq
      assert(ids === (0 until nSpans.toInt), s"doc ${r.getLong(0)} sentinel ids")
      masked += r.getLong(4); total += r.getLong(5)
    }
    val frac = masked.toDouble / total
    assert(frac > 0.10 && frac < 0.20, s"masked fraction $frac off the design point")
  }
}
