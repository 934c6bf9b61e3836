package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.DistRank

/** The distributed global rank must be VALUE-identical to the
  * single-partition `row_number() OVER (ORDER BY …)` it replaces, at any
  * parallelism — that invariance is what lets the token-budget and
  * contrastive-triplet oracles keep grading the scale path with the
  * original single-window SQL. */
class DistRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def withParts[A](n: Int)(f: => A): A = {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("rank equals the global row_number at 1, 7, and 32 shuffle partitions") {
    // keys deliberately skewed: 60% of rows share one quality value, so a
    // quantized-bin decomposition would pile them into one bin — the
    // range key's doc_id tiebreak must spread them instead
    val rows = (1L to 500L).map(i => (i, if (i % 5 != 0) 0.5 else i / 1000.0))
    val df = rows.toDF("doc_id", "q")
    val want = df
      .withColumn("rn", row_number().over(
        Window.orderBy(col("q").desc, col("doc_id"))).cast("long") - 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    for (n <- Seq(1, 7, 32)) withParts(n) {
      val got = DistRank.withGlobalRank(df, "rn", col("q").desc, col("doc_id"))
        .select("doc_id", "rn")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === want, s"rank diverged from the global window at nParts=$n")
    }
  }

  test("ranks are dense, 0-based, and unique") {
    val df = (1L to 101L).map(i => (i, (i * 37 % 11).toDouble)).toDF("id", "k")
    val rns = DistRank.withGlobalRank(df, "rn", col("k"), col("id"))
      .select("rn").collect().map(_.getLong(0)).sorted
    assert(rns === (0L until 101L).toArray)
  }

  test("reserved temp columns are rejected loudly") {
    val df = Seq((1L, 2.0)).toDF("id", "__graft_rank_pid")
    assertThrows[IllegalArgumentException](
      DistRank.withGlobalRank(df, "rn", col("id")))
  }
}
