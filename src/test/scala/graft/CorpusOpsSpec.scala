package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.CorpusOps

/** Planted-fixture checks for the corpus-preparation operators (the
  * oracle gate covers the full corpus; these pin the semantics). */
class CorpusOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** Writes a tiny documents.parquet fixture and returns its dir. */
  private def fixture(docs: Seq[(Long, String, String)]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    docs.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("dedupSegments drops corpus-frequent segments, keeps doc-local text") {
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ") // one full segment
    val dir = fixture(Seq(
      (1L, boiler + " unique one alpha", "en"),
      (2L, boiler + " unique two beta", "en"),
      (3L, boiler + " unique three gamma", "en")))
    val out = CorpusOps.dedupSegments(spark, dir).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_segments") == 2)
      assert(r.getAs[Long]("n_kept") == 1) // the boilerplate segment dropped
      val clean = r.getAs[String]("clean_text")
      assert(!clean.contains("b1"), s"boilerplate survived: $clean")
      assert(clean.contains("unique"))
    }
  }

  test("dedupSegments keeps segments under the frequency threshold") {
    val dir = fixture(Seq(
      (1L, "shared pair text here only twice in corpus now ok fine", "en"),
      (2L, "totally different words that never repeat anywhere else at all", "en")))
    val out = CorpusOps.dedupSegments(spark, dir).collect()
    out.foreach(r => assert(r.getAs[Long]("n_kept") > 0))
  }

  test("piiRedact scrubs emails and phones, counts match") {
    val dir = fixture(Seq((0L, "plain words here", "en"), (1L, "no pii", "en")))
    val out = CorpusOps.piiRedact(spark, dir).orderBy("doc_id").collect()
    // doc 0 gets the injected tail (doc_id % 5 == 0)
    assert(out(0).getAs[Int]("n_emails") == 1)
    assert(out(0).getAs[Int]("n_phones") == 1)
    val red = out(0).getAs[String]("redacted")
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>"))
    assert(!red.contains("@") && !red.contains("555-"))
    assert(out(1).getAs[Int]("n_emails") == 0)
    assert(out(1).getAs[String]("redacted") == "no pii")
  }

  test("packSequences: offsets are contiguous per lang, packs cover tokens") {
    val dir = fixture((1L to 20L).map(i =>
      (i, (1 to 100).map(j => s"t${i}_$j").mkString(" "), if (i % 2 == 0) "en" else "fr")))
    val out = CorpusOps.packSequences(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
        r.getAs[Long]("tok_start"), r.getAs[Long]("pack_first"), r.getAs[Long]("pack_last")))
    Seq("en", "fr").foreach { l =>
      val docs = out.filter(_._1 == l).sortBy(_._2)
      // contiguous stream: each doc starts where the previous ended
      docs.foldLeft(0L) { case (expect, (_, _, n, start, pf, pl)) =>
        assert(start == expect, s"gap in $l stream at $start (expected $expect)")
        assert(pf == start / 512 && pl == (start + n - 1) / 512)
        start + n
      }
    }
  }

  test("splitStable: deterministic, content-free, and stable under corpus growth") {
    val base = (1L to 300L).map(i => (i, s"doc number $i words", "en"))
    val dir = fixture(base)
    val out = CorpusOps.splitStable(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getString(3))).sortBy(_._1)
    // buckets in range, split label derived from the bucket
    out.foreach { case (_, b, s) =>
      assert(b >= 0 && b < 100)
      assert(s == (if (b < 80) "train" else if (b < 90) "val" else "test"))
    }
    // roughly proportional (md5 is uniform; 300 docs, generous bounds)
    val frac = out.count(_._3 == "train").toDouble / out.length
    assert(frac > 0.65 && frac < 0.95, s"train fraction $frac")
    // STABILITY: the same doc keeps its split when the corpus doubles
    val dir2 = fixture(base ++ (301L to 600L).map(i => (i, s"later doc $i", "en")))
    val out2 = CorpusOps.splitStable(spark, dir2).collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    out.foreach { case (id, _, s) => assert(out2(id) == s, s"doc $id moved") }
  }

  test("chunkOverlap: windows cover every token with the stated overlap") {
    val n = 150
    val dir = fixture(Seq((1L, (1 to n).map(i => s"w$i").mkString(" "), "en")))
    val out = CorpusOps.chunkOverlap(spark, dir, window = 64, stride = 48)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    // starts are 1, 49, 97; 145 is suppressed — its window (tokens
    // 145..150) sits entirely inside the chunk at 97 (tokens 97..150),
    // so emitting it would duplicate text verbatim
    assert(out.map(_._1).toSeq == Seq(1L, 49L, 97L))
    // no chunk's tokens are a subset of the previous chunk's
    out.map(_._3.split(" ").toSet).sliding(2).foreach {
      case Array(a, b) => assert(!b.subsetOf(a), "redundant chunk emitted")
      case _ =>
    }
    // each chunk holds min(window, n - start + 1) tokens
    out.foreach { case (s, sz, _) => assert(sz == math.min(64L, n - s + 1)) }
    // consecutive chunks share exactly the tokens both windows cover
    val sets = out.map(_._3.split(" ").toSet)
    out.map(_._1).sliding(2).zip(sets.sliding(2)).foreach {
      case (Array(s1, s2), Array(a, b)) =>
        val expected = math.max(0L, math.min(s1 + 63, n.toLong) - s2 + 1)
        assert(a.intersect(b).size == expected, s"overlap at start $s2")
      case _ =>
    }
    // every token appears in some chunk
    assert(sets.reduce(_ union _).size == n)
  }

  test("lengthBuckets: powers-of-two histogram accounts for every doc and token") {
    val docs = Seq(1, 2, 3, 15, 16, 17, 100, 1000).zipWithIndex.map { case (len, i) =>
      ((i + 1).toLong, (1 to len).map(j => s"t$j").mkString(" "), "en")
    }
    val dir = fixture(docs)
    val out = CorpusOps.lengthBuckets(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    out.foreach { case (b, lo, hi, _, _) =>
      assert(lo == (1L << b) && hi == (1L << (b + 1)) - 1)
    }
    assert(out.map(_._4).sum == docs.length)
    assert(out.map(_._5).sum == docs.map(_._2.split(" ").length.toLong).sum)
    // doc of length 16 lands in bucket 4 (lo=16), length 15 in bucket 3
    val byBucket = out.map(t => t._1 -> t._4).toMap
    assert(byBucket(0) == 1L && byBucket(1) == 2L) // len1 | len2,len3
  }

  test("vocabEncode ranks by frequency (ties by word), maps OOV to 0, keeps order") {
    // freq: the=3, cat=2, dog=2, zzz=1 → V=3 vocab: the=1, cat=2, dog=3
    // (cat before dog on the count tie by word order); zzz is OOV → 0
    val dir = fixture(Seq(
      (1L, "the cat sat", "en"),
      (2L, "the dog sat", "en"),
      (3L, "the cat dog zzz", "en")))
    // 'sat' also has count 2 — with V=3 the tie at count 2 resolves
    // alphabetically: cat, dog, sat → sat (rank 4) falls out as OOV
    val out = CorpusOps.vocabEncode(spark, dir, v = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(out(0) == ((1L, "1,2,0", 1L)))  // the cat sat → sat OOV
    assert(out(1) == ((2L, "1,3,0", 1L)))  // the dog sat
    assert(out(2) == ((3L, "1,2,3,0", 1L))) // the cat dog zzz
  }

  test("lmScore: hand-computed Laplace bigram cross-entropy on a planted corpus") {
    // corpus: doc1 = "a a a a", doc2 = "a b c d"
    // unigrams: a:5 b:1 c:1 d:1, V=4
    // bigrams:  (a,a):3 (a,b):1 (b,c):1 (c,d):1
    // doc1: 3 × -log2((3+1)/(5+4)) = log2(9/4)          = 1.169925 → 1.1699
    // doc2: (-log2(2/9) - log2(2/5) - log2(2/5)) / 3    = 1.604594 → 1.6046
    val dir = fixture(Seq((1L, "a a a a", "en"), (2L, "a b c d", "en")))
    val out = CorpusOps.lmScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(out.length == 2)
    assert(out(0) == ((1L, 3L, 1.1699)))
    assert(out(1) == ((2L, 3L, 1.6046)))
    // the repetitive doc is the more "expected" one under the corpus LM
    assert(out(0)._3 < out(1)._3)
  }

  test("sourceKl: hand-computed divergence for a balanced and a skewed source") {
    // the shared fixture helper stamps one source for every doc — this
    // test needs two, so it writes its own documents.parquet
    val d2 = java.nio.file.Files.createTempDirectory("graft_kl").toString
    Seq(
      (1L, "x y x y", "en", "balanced", 7L),
      (2L, "x x x x", "en", "skewed", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d2/documents.parquet")
    val rows = CorpusOps.sourceKl(spark, d2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // corpus: x:6 y:2 -> p(x)=0.75 p(y)=0.25
    // balanced: p_s(x)=p_s(y)=0.5 -> KL = 0.5·log2(0.5/0.75) + 0.5·log2(0.5/0.25)
    //                                    = 0.5·(-0.58496) + 0.5·1 = 0.2075
    // skewed:   p_s(x)=1           -> KL = log2(1/0.75) = 0.415
    assert(rows(0) == (("balanced", 4L, 2L, 0.2075)))
    assert(rows(1) == (("skewed", 4L, 1L, 0.415)))
  }

  test("lmScore skips docs without bigrams") {
    val dir = fixture(Seq((1L, "solo", "en"), (2L, "two words", "en")))
    val out = CorpusOps.lmScore(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("exactSubstringSpans: planted cross-doc span found with exact boundaries; " +
    "sub-minSpan collisions suppressed") {
    // 20-token run shared verbatim by docs 1 and 2 at different offsets;
    // doc 3 shares only a single 8-gram with doc 1 (span = 8 < minSpan 12);
    // doc 4 is entirely unique
    val shared = (1 to 20).map(i => s"dup$i").mkString(" ")
    val gram8 = (1 to 8).map(i => s"g$i").mkString(" ")
    val u = (p: String, n: Int) => (1 to n).map(i => s"$p$i").mkString(" ")
    val dir = fixture(Seq(
      (1L, s"${u("a", 5)} $shared ${u("b", 5)} $gram8", "en"),
      (2L, s"${u("c", 9)} $shared ${u("d", 3)}", "en"),
      (3L, s"${u("e", 7)} $gram8 ${u("f", 7)}", "en"),
      (4L, u("z", 40), "en")))
    val out = CorpusOps.exactSubstringSpans(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // doc 1: 5 + 20 + 5 + 8 = 38 tokens, one 20-token span (the 8-gram
    // collision is an 8-token run, under minSpan)
    assert(out(1L) == ((38L, 1L, 20L, 20L)))
    assert(out(2L) == ((32L, 1L, 20L, 20L)))
    assert(out(3L) == ((22L, 0L, 0L, 0L)))
    assert(out(4L) == ((40L, 0L, 0L, 0L)))
  }

  test("exactSubstringSpans: adjacent overlapping grams merge into ONE span, " +
    "tokens counted once") {
    // doc 2 contains doc 1's whole 30-token text -> doc 1 is one full span
    val run = (1 to 30).map(i => s"t$i").mkString(" ")
    val dir = fixture(Seq(
      (1L, run, "en"),
      (2L, s"prefix1 prefix2 $run suffix1", "en")))
    val out = CorpusOps.exactSubstringSpans(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((30L, 1L, 30L, 30L))) // whole doc duplicated
    assert(out(2L) == ((33L, 1L, 30L, 30L))) // the run, not the affixes
  }

  test("pmiCollocations: a planted always-adjacent rare pair tops the ranking; " +
    "frequent-word self-pairs score near zero") {
    // 6 docs of exactly "alpha beta" (the collocation), 20 filler docs of
    // repeated "x": c_ab(alpha,beta)=6 with c_alpha=c_beta=6 -> high PMI;
    // (x,x) co-occurs 80 times but x is everywhere -> PMI ~ 0
    val dir = fixture(
      (1L to 6L).map(i => (i, "alpha beta", "en")) ++
        (7L to 26L).map(i => (i, "x x x x x", "en")))
    val rows = CorpusOps.pmiCollocations(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    assert(rows.forall(_.getAs[Long]("c_ab") >= 5))
    val top = rows.head
    assert((top.getAs[String]("w1"), top.getAs[String]("w2")) == ("alpha", "beta"))
    val pmiByPair = rows.map(r =>
      (r.getAs[String]("w1"), r.getAs[String]("w2")) -> r.getAs[Double]("pmi")).toMap
    assert(pmiByPair(("alpha", "beta")) > 2.0)
    assert(math.abs(pmiByPair(("x", "x"))) < 1.0)
  }

  test("vocabGrowth: hand-computed prefix curve on a planted corpus, " +
    "cumulative columns monotone") {
    // max_id=3 -> doc 1 lands in bucket ceil(10/3)=4, doc 2 in 7, doc 3 in 10
    val dir = fixture(Seq(
      (1L, "a b", "en"), (2L, "a c", "en"), (3L, "a b c d", "en")))
    val rows = CorpusOps.vocabGrowth(spark, dir).collect()
      .map(r => r.getAs[Int]("pct") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab"))))
      .toMap
    assert(rows(40) == ((1L, 2L, 2L)))  // doc 1: tokens a b
    assert(rows(70) == ((2L, 4L, 3L)))  // + doc 2: new type c
    assert(rows(100) == ((3L, 8L, 4L))) // + doc 3: new type d
    val ordered = CorpusOps.vocabGrowth(spark, dir).collect()
    Seq[org.apache.spark.sql.Row => Long](
      _.getAs[Long]("n_docs"), _.getAs[Long]("n_tokens"), _.getAs[Long]("vocab"))
      .foreach { f =>
        val xs = ordered.map(f)
        assert(xs.zip(xs.tail).forall { case (p, q) => p <= q }, "must be cumulative")
      }
  }

  test("doremiReweight: weights form a smoothed distribution, floor-bounded, " +
    "monotone in excess loss") {
    val rows = CorpusOps.doremiReweight(spark, "/root/testdata/sf0.001").collect()
    val k = rows.length
    assert(k > 1)
    val ws = rows.map(_.getAs[Double]("weight"))
    assert(math.abs(ws.sum - 1.0) < 1e-6, s"weights must sum to 1, got ${ws.sum}")
    assert(ws.forall(_ >= 0.01 / k - 1e-9), "uniform-smoothing floor violated")
    // EG update is monotone: sorting by excess must sort by weight
    val byExcess = rows.sortBy(r => (r.getAs[Double]("excess"), r.getAs[String]("source")))
    val wSorted = byExcess.map(_.getAs[Double]("weight"))
    assert(wSorted.zip(wSorted.tail).forall { case (a, b) => a <= b + 1e-12 })
  }

  test("fimTransform: pivot arithmetic replays by hand; unapplied docs keep " +
    "their original digest; PSM is a permutation plus the two sentinels") {
    val dir = fixture(Seq(
      (2L, "a b c d e f g h", "en"),   // doc_id even: FIM applied
      (3L, "p q r s t", "en"),         // odd: passthrough
      (4L, "x y z", "en")))
    val out = CorpusOps.fimTransform(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getBoolean(4), r.getString(5)))).toMap
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def pivots(docId: Long, n: Int): (Int, Int) = {
      val h = md5hex(docId.toString)
      val a = (java.lang.Long.parseLong(h.substring(0, 15), 16) % (n + 1)).toInt
      val b = (java.lang.Long.parseLong(h.substring(16, 31), 16) % (n + 1)).toInt
      (math.min(a, b), math.max(a, b))
    }
    Seq((2L, "a b c d e f g h"), (4L, "x y z")).foreach { case (id, text) =>
      val tk = text.split(" ")
      val (p1, p2) = pivots(id, tk.length)
      val (n, g1, g2, applied, digest) = out(id)
      assert((n, g1, g2, applied) === ((tk.length, p1, p2, true)), s"doc $id pivots")
      val psm = (tk.take(p1) ++ Array("<SUF>") ++ tk.drop(p2) ++
        Array("<MID>") ++ tk.slice(p1, p2)).mkString(" ")
      assert(digest === md5hex(psm), s"doc $id digest diverged from hand PSM")
      assert(psm.split(" ").filterNot(Set("<SUF>", "<MID>")).sorted
        === tk.sorted, s"doc $id: PSM lost or duplicated a token")
    }
    val (_, _, _, applied3, digest3) = out(3L)
    assert(!applied3 && digest3 === md5hex("p q r s t"),
      "unapplied doc must keep its original token-stream digest")
  }
}
