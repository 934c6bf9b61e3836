package graft

import org.scalatest.funsuite.AnyFunSuite

/** BPE merge learning against an independent driver-side reference
  * implementation on the fixture corpus — the distributed fold and the
  * plain-Scala loop must learn identical merge lists. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  /** Plain-Scala reference BPE: same argmax tie-break (count desc, then
    * pair), same left-to-right non-overlapping merge. */
  private def referenceBpe(words: Map[String, Long],
                           nMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, f) => (w.split("").toVector :+ "</w>") -> f }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), n) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((l, r, n))
        vocab = vocab.map { case (syms, f) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { x =>
            if (merged.nonEmpty && merged.last == l && x == r)
              merged(merged.length - 1) = l + r
            else merged += x
          }
          merged.toVector -> f
        }
      }
    }
    out.toSeq
  }

  test("distributed merges equal the reference on the fixture corpus") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.ext.CorpusOps.bpeMerges(spark, dir, nMerges = 8)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    import org.apache.spark.sql.functions._
    val wf = graft.ops.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceBpe(wf, 8)
    assert(got == want)
    assert(got.size == 8)
  }

  test("consecutive-pair merge is left-to-right non-overlapping") {
    // 'aaaa</w>' with pair (a,a) must become 'aa','aa','</w>' — the
    // classic overlap trap; exercised via the reference + a crafted corpus
    val merges = referenceBpe(Map("aaaa" -> 10L, "b" -> 1L), 1)
    assert(merges.head._1 == "a" && merges.head._2 == "a")
    assert(merges.head._3 == 30L, "3 non-overlapping (a,a) slots x freq 10")
  }

  test("bpeEncode: final splits equal a reference replay of the learned merges") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val wf = graft.ops.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = referenceBpe(wf, 8).map { case (l, r, _) => (l, r) }
    def replay(w: String): Vector[String] =
      merges.foldLeft(w.split("").toVector :+ "</w>") { case (syms, (l, r)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { x =>
          if (out.nonEmpty && out.last == l && x == r) out(out.length - 1) = l + r
          else out += x
        }
        out.toVector
      }
    val got = graft.ext.CorpusOps.bpeEncode(spark, dir, nMerges = 8).collect()
    assert(got.length == wf.size)
    got.foreach { row =>
      val (w, bpe, n, freq) = (row.getString(0), row.getString(1),
        row.getInt(2), row.getLong(3))
      val want = replay(w)
      assert(bpe == want.mkString(" "), s"word '$w' split drifted")
      assert(n == want.length)
      assert(freq == wf(w))
      // lossless: pieces concatenate back to the word + terminator
      assert(bpe.replace(" ", "") == w + "</w>")
    }
  }

  test("pair counts query agrees with merge step 1") {
    val dir = "/root/testdata/sf0.001"
    val top = graft.ext.CorpusOps.bpePairCounts(spark, dir, topN = 1)
      .collect().head
    val firstMerge = graft.ext.CorpusOps.bpeMerges(spark, dir, nMerges = 1)
      .collect().head
    assert((top.getString(0), top.getString(1), top.getLong(2)) ==
      (firstMerge.getString(1), firstMerge.getString(2), firstMerge.getLong(3)))
  }
}
