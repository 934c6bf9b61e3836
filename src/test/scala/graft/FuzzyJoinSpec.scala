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
}
