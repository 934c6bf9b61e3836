package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.FuzzyJoin

/** PassJoin edit-distance join: pigeonhole completeness against a
  * brute-force levenshtein join, plus targeted edit placements the
  * blocking must survive (boundary edits, one-segment concentration,
  * length-changing edits at the extremes of the ±d window). */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def pairs(strs: Seq[String], d: Int): Set[(Long, Long, Long)] =
    FuzzyJoin.passJoinPairs(
      strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s"), d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def brute(strs: Seq[String], d: Int): Set[(Long, Long, Long)] = {
    val e = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    e.as("a").crossJoin(e.as("b"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("dist", levenshtein(col("a.s"), col("b.s")).cast("long"))
      .filter(col("dist") <= d && length(col("a.s")) >= d + 1 && length(col("b.s")) >= d + 1)
      .select(col("a.id"), col("b.id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("substitution / insertion / deletion at every position of a short string") {
    val base = "ABCDEFGH"
    val variants = (0 until base.length).flatMap { i =>
      Seq(
        base.updated(i, 'Z'),                              // substitution
        base.substring(0, i) + "Z" + base.substring(i),    // insertion
        base.substring(0, i) + base.substring(i + 1))      // deletion
    }.distinct
    val strs = base +: variants
    assert(pairs(strs, 1).filter(p => p._1 == 0L || p._2 == 0L).size ===
      variants.count(v => v != base))
  }

  test("edits concentrated in one segment are still found via the intact segments") {
    // d=2, k=3: both edits land inside segment 0 — segments 1 and 2 match
    val a = "AAAABBBBCCCC"
    val b = "ZZAABBBBCCCC" // two substitutions, both in slot 0
    assert(pairs(Seq(a, b), 2) === Set((0L, 1L, 2L)))
  }

  test("edits spread over d distinct segments leave one intact segment") {
    val a = "AAAABBBBCCCC"
    val b = "AZAABBZBCCCC" // one substitution in slot 0, one in slot 1
    assert(pairs(Seq(a, b), 2) === Set((0L, 1L, 2L)))
  }

  test("length difference of exactly d (window extreme) is found") {
    val a = "AAAABBBBCCCC"
    val b = "AAAABBBBCCCCZZ" // two appended chars: dist 2, len diff 2
    val c = "AABBBBCCCC"     // two deleted leading chars: dist 2, len diff 2
    assert(pairs(Seq(a, b, c), 2).contains((0L, 1L, 2L)))
    assert(pairs(Seq(a, b, c), 2).contains((0L, 2L, 2L)))
  }

  test("distance d+1 pairs are rejected by the exact verify") {
    val a = "AAAABBBBCCCC"
    val b = "ZZZABBBBCCCC" // three substitutions
    assert(pairs(Seq(a, b), 2) === Set.empty)
  }

  test("pigeonhole completeness: blocking equals brute force on a random-ish corpus") {
    // deterministic pseudo-random corpus over a 4-letter alphabet with
    // planted near-dups at several lengths (no Math.random: fixed seed)
    val rnd = new scala.util.Random(20260815L)
    val alpha = "ABCD"
    val bases = Seq.fill(40)((8 + rnd.nextInt(10), rnd)).map { case (n, r) =>
      (0 until n).map(_ => alpha(r.nextInt(4))).mkString
    }
    val mutated = bases.map { s =>
      val i = rnd.nextInt(s.length)
      rnd.nextInt(3) match {
        case 0 => s.updated(i, alpha(rnd.nextInt(4)))
        case 1 => s.substring(0, i) + alpha(rnd.nextInt(4)) + s.substring(i)
        case 2 if s.length > 4 => s.substring(0, i) + s.substring(i + 1)
        case _ => s
      }
    }
    val strs = (bases ++ mutated).distinct
    for (d <- Seq(1, 2, 3))
      assert(pairs(strs, d) === brute(strs, d), s"mismatch at d=$d")
  }

  test("strings shorter than d+1 chars are excluded, not crashed on") {
    assert(pairs(Seq("AB", "AC", "ABCD"), 2) === Set.empty)
  }

  // ---- doc-level operator: wide-alphabet token encode -------------------

  /** Exact token-sequence Levenshtein, driver-side — the truth the
    * one-char-per-token encode must reproduce. A codepoint collision in
    * the encode (two tokens → one char) or a broken rank mapping shows
    * up as an extra/shifted pair against this. */
  private def tokLev(a: Array[String], b: Array[String]): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  /** Runs fuzzyTokenJoin over a synthetic corpus and compares to the
    * exact token-Levenshtein join. */
  private def checkTokenJoin(all: IndexedSeq[Array[String]]): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzy").toString
    all.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    val got = FuzzyJoin.fuzzyTokenJoin(spark, dir, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      i <- all.indices; j <- all.indices if i < j
      dist = tokLev(all(i), all(j)) if dist <= 2
    } yield (i.toLong, j.toLong, dist.toLong)).toSet
    assert(got === want)
  }

  test("fuzzyTokenJoin: vocabulary crossing the 57-rank ASCII->BMP boundary stays injective") {
    val rnd = new scala.util.Random(0xB0DA57L)
    // 12 base docs x 6 disjoint tokens = 72-token vocabulary: ranks span
    // both sides of the cpOfRank piecewise boundary
    val base = (0 until 12).map(i =>
      (0 until 6).map(j => f"w${i * 6 + j}%03d").toArray)
    val mutated = base.zipWithIndex.collect { case (t, i) if i % 2 == 0 =>
      val t2 = t.clone(); t2(rnd.nextInt(6)) = s"m$i"; t2 }
    checkTokenJoin(base ++ mutated)
  }

  test("fuzzyTokenJoin: >1k-token vocabulary (the lifted 57-token cap) matches exact token edit distance") {
    val rnd = new scala.util.Random(0x9A11AD5L)
    // 120 base docs x 10 disjoint tokens = 1200-token vocabulary, plus
    // planted 1- and 2-token-edit near-dups (each mutation introduces a
    // FRESH token, growing the vocabulary further)
    val base = (0 until 120).map(i =>
      (0 until 10).map(j => f"tok${i * 10 + j}%04d").toArray)
    val mutated = base.zipWithIndex.collect { case (t, i) if i % 3 == 0 =>
      val t2 = t.clone()
      (0 until 1 + (i / 3) % 2).foreach(e => t2(rnd.nextInt(10)) = s"mut${i}_$e")
      t2
    }
    val all = base ++ mutated
    assert(all.flatten.distinct.size > 1000, "fixture must exceed 1k distinct tokens")
    checkTokenJoin(all)
  }
}
