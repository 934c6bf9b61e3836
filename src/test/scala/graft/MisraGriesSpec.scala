package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HeavyHitterFunctions

/** The Misra–Gries aggregate's guarantee under real partial/merge trees:
  * candidates must contain every item with true frequency > N/k, for any
  * partitioning — including adversarial ones that force evictions. */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def candidates(items: Seq[String], k: Int, parts: Int): Set[String] = {
    HeavyHitterFunctions.register(spark)
    items.toDF("item").repartition(parts)
      .agg(HeavyHitterFunctions.misra_gries(col("item"), k).as("c"))
      .head().getSeq[String](0).toSet
  }

  test("heavy item survives evictions across many distinct light items") {
    // one item at 25% of a stream otherwise made of unique items: with
    // k = 8 counters over 301 distinct values, eviction happens
    // constantly, but freq > N/8 must survive by the MG guarantee
    val heavy = Seq.fill(100)("HH")
    val light = (0 until 300).map(i => s"light$i")
    // interleave so the heavy item never benefits from adjacency
    val stream = (heavy ++ light ++ heavy ++ light ++ heavy ++ heavy).take(400)
    for (parts <- Seq(1, 3, 17)) {
      val c = candidates(stream, k = 8, parts = parts)
      assert(c.contains("HH"), s"heavy item evicted at parts=$parts: $c")
      assert(c.size <= 7, s"more than k-1 counters survived: ${c.size}")
    }
  }

  test("guarantee holds on fixture characters for several k") {
    val chars = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), "")).as("item"))
    val n = chars.count()
    val exact = chars.groupBy("item").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (k <- Seq(4, 10, 15, 40)) {
      HeavyHitterFunctions.register(spark)
      val cands = chars.repartition(13)
        .agg(HeavyHitterFunctions.misra_gries(col("item"), k).as("c"))
        .head().getSeq[String](0).toSet
      val heavy = exact.filter { case (_, c) => c * k > n }.keySet
      assert(heavy.subsetOf(cands),
        s"k=$k lost heavy items ${heavy -- cands} (candidates: $cands)")
      assert(cands.size <= math.max(k - 1, 1))
    }
  }

  test("heavy_hitters query equals the exact filtered group-by") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.ext.TextOps.heavyHitters(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val chars = graft.ops.Tables.documents(spark, dir)
      .select(explode(split(col("text"), "")).as("item"))
    val n = chars.count()
    val want = chars.groupBy("item").count()
      .filter(col("count") * 15 > n)
      .orderBy(col("count").desc, col("item"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty, "fixture should have at least one heavy character")
  }

  test("empty input yields an empty candidate array") {
    HeavyHitterFunctions.register(spark)
    val c = Seq.empty[String].toDF("item")
      .agg(HeavyHitterFunctions.misra_gries(col("item"), 5).as("c"))
      .head().getSeq[String](0)
    assert(c.isEmpty)
  }
}
