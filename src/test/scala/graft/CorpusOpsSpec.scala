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
}
