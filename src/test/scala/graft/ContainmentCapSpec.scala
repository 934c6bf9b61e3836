package graft

import org.scalatest.funsuite.AnyFunSuite

/** The containment-dedup gram-df cap (`maxGramDf`) is the hot-bucket
  * bound that keeps the gram-keyed pair join from going quadratic on
  * boilerplate: a gram appearing in F docs contributes F² join rows, so
  * grams with df > cap are excluded as evidence BEFORE the pair join.
  * These specs pin both sides of that contract on synthetic corpora. */
class ContainmentCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("grams above the df cap are excluded: a 60-doc boilerplate corpus " +
    "yields NO pairs under cap=50 (the bucket never goes quadratic)") {
    val boiler = "a b c d e f g h i j"
    val d = docs((0L until 60L).map(i => i -> boiler))
    val out = ext.Retrieval.containmentDedupDocs(d, n = 8, thresh = 0.8, maxGramDf = 50)
    assert(out.count() == 0,
      "df-capped grams must contribute no containment evidence")
  }

  test("the same corpus under a cap ABOVE its df reports full containment " +
    "for every ordered pair") {
    val boiler = "a b c d e f g h i j"
    val d = docs((0L until 10L).map(i => i -> boiler))
    val out = ext.Retrieval.containmentDedupDocs(d, n = 8, thresh = 0.8, maxGramDf = 50)
      .collect()
    // 10 identical docs -> 90 ordered pairs, containment 1.0 each
    assert(out.length == 90)
    assert(out.forall(_.getAs[Double]("containment") == 1.0))
  }

  test("sketch containment: no false negatives on full containment — " +
    "every exact 1.0 pair from the fixture surfaces with estimate 1.0") {
    val dir = "/root/testdata/sf0.001"
    val exact = ext.Retrieval.containmentDedup(spark, dir).collect()
      .filter(_.getAs[Double]("containment") == 1.0)
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(exact.nonEmpty, "fixtures plant fully-contained docs")
    val sketch = ext.Retrieval.containmentSketch(spark, dir).collect()
      .map(r => ((r.getAs[Long]("a_id"), r.getAs[Long]("b_id")),
        r.getAs[Double]("containment_est"))).toMap
    exact.foreach { p =>
      assert(sketch.get(p).contains(1.0),
        s"full containment $p must be sketch-exact (A ⊆ B ⇒ bottom-k(A) ⊆ grams(B))")
    }
  }

  test("partial containment is asymmetric: the quoted doc scores 1.0 " +
    "against its superset, the superset scores below threshold") {
    val short = "q w e r t y u i"                        // 8 tokens = 1 gram
    val long = short + " extra tokens one two three four five six seven"
    val d = docs(Seq(1L -> short, 2L -> long))
    val all = ext.Retrieval.containmentDedupDocs(d, n = 8, thresh = 0.0)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("containment"))).toSet
    val c12 = all.find(p => p._1 == 1L && p._2 == 2L).map(_._3)
    val c21 = all.find(p => p._1 == 2L && p._2 == 1L).map(_._3)
    assert(c12.contains(1.0), s"short-in-long must be full containment: $all")
    assert(c21.exists(_ < 0.8), s"long-in-short must stay below threshold: $all")
  }
}
