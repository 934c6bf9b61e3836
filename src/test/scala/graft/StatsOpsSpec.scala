package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant gates for the corpus-statistics operators (ext.StatsOps).
  * These assert the LAWS each construction must obey on any input —
  * the DuckDB oracles (cms_freq, zipf_fit, epoch_shuffle, char_entropy,
  * profile_stats) pin the exact values per scale. */
class StatsOpsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.session

  test("cms_freq: the Count-Min estimate never underestimates and all cells are probed") {
    val df = ext.StatsOps.cmsFreq(spark, sf).cache()
    try {
      val rows = df.collect()
      assert(rows.length == 20)
      rows.foreach { r =>
        val truth = r.getAs[Long]("true_cnt")
        val est = r.getAs[Long]("cms_est")
        val over = r.getAs[Long]("overcount")
        assert(est >= truth, s"CMS underestimated ${r.getAs[String]("tok")}")
        assert(over == est - truth)
      }
      // ranks are the contiguous top-20
      assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 20))
      // top-20 counts are non-increasing in rank order
      val cnts = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("true_cnt"))
      assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    } finally df.unpersist()
  }

  test("cms_freq: depth-1 width-1 degenerates to the total token count") {
    val df = ext.StatsOps.cmsFreq(spark, sf, depth = 1, width = 1, topK = 3)
    val n = graft.ops.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " "))).count()
    df.collect().foreach { r =>
      assert(r.getAs[Long]("cms_est") == n,
        "single-cell sketch must count every token")
    }
  }

  test("zipf_fit: natural-language corpus fits a negative slope with all points used") {
    val vocab = graft.ops.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct("t")).collect().head.getLong(0)
    val r = ext.StatsOps.zipfFit(spark, sf).collect().head
    assert(r.getAs[Int]("n_pts") == math.min(256L, vocab))
    assert(r.getAs[Double]("slope") < 0.0,
      "token frequencies must decay with rank")
  }

  test("epoch_shuffle: each epoch is a bijection with contiguous shard positions") {
    val df = ext.StatsOps.epochShuffle(spark, sf).cache()
    try {
      val nDocs = graft.ops.Tables.documents(spark, sf).count()
      assert(df.count() == 2 * nDocs)
      // every doc appears exactly once per epoch
      assert(df.groupBy("epoch", "doc_id").count()
        .filter(col("count") =!= 1).count() == 0)
      // positions within each (epoch, shard) are exactly 1..n
      val bad = df.groupBy("epoch", "shard")
        .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
          countDistinct("pos").as("d"))
        .filter(col("lo") =!= 1 || col("hi") =!= col("n") || col("d") =!= col("n"))
      assert(bad.count() == 0, "shard positions must be contiguous ranks")
      // the two epochs are genuinely different permutations
      val moved = df.filter(col("epoch") === 0).as("a")
        .join(df.filter(col("epoch") === 1).as("b"), Seq("doc_id"))
        .filter(col("a.shard") =!= col("b.shard") ||
          col("a.pos") =!= col("b.pos"))
        .count()
      assert(moved > 0, "epoch 1 must reshuffle relative to epoch 0")
    } finally df.unpersist()
  }

  test("char_entropy: bounded by 0 and log2(alphabet), uniform text hits the bound") {
    val rows = ext.StatsOps.charEntropy(spark, sf).collect()
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_bits")
      val k = r.getAs[Long]("n_distinct_ch")
      assert(h >= 0.0 && h <= math.log(k.toDouble) / math.log(2.0) + 1e-9,
        s"doc ${r.getAs[Long]("doc_id")}: H=$h outside [0, log2($k)]")
    }
    // entropy is scale-free in repetition: a doc of one repeated char
    // would score exactly 0 — no such doc exists in testdata, but every
    // real doc must use at least 2 distinct chars (tokens + spaces)
    assert(rows.forall(_.getAs[Long]("n_distinct_ch") >= 2))
  }

  test("profile_stats: ndv and null counts are consistent with the row count") {
    val rows = ext.StatsOps.profileStats(spark, sf).collect()
    assert(rows.length == 6)
    val nRows = rows.head.getAs[Long]("n_rows")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == nRows, "all passes see the same table")
      val nulls = r.getAs[Long]("n_nulls")
      val ndv = r.getAs[Long]("ndv")
      assert(nulls >= 0 && ndv >= 1 && ndv <= nRows - nulls)
      assert(r.getAs[String]("min_repr") <= r.getAs[String]("max_repr") ||
        r.getAs[String]("col_name") == "o_totalprice" ||
        r.getAs[String]("col_name") == "o_orderkey" ||
        r.getAs[String]("col_name") == "o_custkey",
        "string-ordered reprs must order for string/date columns")
    }
    // key column is unique and dense
    val key = rows.find(_.getAs[String]("col_name") == "o_orderkey").get
    assert(key.getAs[Long]("ndv") == nRows && key.getAs[Long]("n_nulls") == 0)
  }
}
