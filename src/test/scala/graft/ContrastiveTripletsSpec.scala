package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Sampling

/** Triplet-construction laws: the positive really is a same-set dup of
  * the anchor, the negative really is not, nobody pairs with themselves,
  * and every dup-group member anchors exactly once (minus the rare
  * hash-collision filter). */
class ContrastiveTripletsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  test("positives share the anchor's distinct-token set; negatives do not") {
    val keyOf = graft.ops.Tables.documents(spark, sfDir)
      .withColumn("k", md5(concat_ws("\u0001",
        array_sort(array_distinct(split(col("text"), " "))))))
      .select("doc_id", "k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Sampling.contrastiveTriplets(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, p, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a != p && a != n && p != n, s"degenerate triplet ($a,$p,$n)")
      assert(keyOf(a) === keyOf(p), s"positive $p not a dup of anchor $a")
      assert(keyOf(a) !== keyOf(n), s"negative $n IS a dup of anchor $a")
    }
    // coverage: anchors ≈ all docs whose set key occurs ≥2 times (a few
    // may drop to the negative-collision filter, never more than a few)
    val dupDocs = keyOf.groupBy(_._2).values.filter(_.size >= 2).map(_.size).sum
    assert(rows.length >= dupDocs - 3 && rows.length <= dupDocs)
  }
}
