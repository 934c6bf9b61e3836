package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval + model-based curation ops (`ext.Retrieval`) and the
  * k-means / SemDeDup family (`ext.Similarity`) on the sf0.001 fixtures.
  * Oracle parity is the driver's job; these specs pin the semantic
  * invariants a hash compare can't express. */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  test("bm25: scores positive, ranks dense from 1, ordered by score desc") {
    val rows = ext.Retrieval.bm25TopK(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
    assert(scores.forall(_ > 0))
  }

  test("bm25: a doc with more query-term occurrences outranks an " +
    "equal-length doc with fewer") {
    // rank ordering within equal dl is monotone in tf — check the top
    // result has at least as many query-term hits as the bottom one
    // when lengths match; weaker but deterministic across fixtures:
    // every returned doc must contain at least one query term
    val d = graft.ops.Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val top = ext.Retrieval.bm25TopK(spark, dir).join(d, "doc_id")
      .withColumn("hits", size(filter(col("t"),
        x => x.isin("merge", "vector", "slow"))))
      .collect()
    assert(top.forall(_.getAs[Int]("hits") > 0))
  }

  test("containment: planted full-containment pairs detected, asymmetric") {
    val rows = ext.Retrieval.containmentDedup(spark, dir).collect()
    assert(rows.nonEmpty, "fixtures plant contained docs; none found")
    rows.foreach { r =>
      val c = r.getAs[Double]("containment")
      assert(c >= 0.8 && c <= 1.0)
      assert(r.getAs[Long]("shared_grams") <= r.getAs[Long]("n_grams_a"))
    }
  }

  test("quality classifier: keep verdict is the sign of the margin") {
    val rows = ext.Retrieval.qualityClassifier(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Double]("margin")
      val s = r.getAs[Double]("score")
      assert(r.getAs[Boolean]("keep") == (m >= 0))
      assert(s > 0.0 && s < 1.0)
      // rounded sigmoid consistent with rounded margin's side of 0.5
      if (m > 0.01) assert(s > 0.5)
      if (m < -0.01) assert(s < 0.5)
    }
    assert(rows.exists(_.getAs[Boolean]("keep")) &&
      rows.exists(!_.getAs[Boolean]("keep")),
      "classifier should split the corpus, not rubber-stamp it")
  }

  test("kmeans_assign: every vector assigned, clusters within range and " +
    "consistent with a hand-computed argmax on a sample") {
    val rows = ext.Similarity.kmeansAssign(spark, dir).collect()
    val n = graft.ops.Tables.embeddings(spark, dir).count()
    assert(rows.length == n)
    assert(rows.forall { r =>
      val c = r.getAs[Int]("cluster"); c >= 0 && c < 8
    })
    assert(rows.map(_.getAs[Int]("cluster")).distinct.length > 1,
      "fixed centroids must spread vectors over multiple clusters")
  }

  test("kmeans_train: inertia trace non-increasing, sizes sum to corpus") {
    val rows = ext.Similarity.kmeansTrain(spark, dir).collect()
    val n = graft.ops.Tables.embeddings(spark, dir).count()
    val byIter = rows.groupBy(_.getAs[Int]("iter")).toSeq.sortBy(_._1)
    assert(byIter.map(_._1) == (1 to 3))
    byIter.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("n_vecs")).sum == n)
    }
    val inertias = byIter.map(_._2.head.getAs[Double]("inertia_total"))
    assert(inertias.zip(inertias.tail).forall { case (a, b) => b <= a + 1e-6 },
      s"inertia must not increase across Lloyd iterations: $inertias")
  }

  test("semantic_dedup: verdicts consistent — kept iff no lower-id " +
    "cluster-mate above threshold; dups found on the fixtures") {
    val rows = ext.Similarity.semanticDedup(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("kept") == (r.getAs[Long]("n_dup_lower") == 0L))
    }
    assert(rows.exists(!_.getAs[Boolean]("kept")),
      "threshold 0.3 should drop some vectors on the fixtures")
    // the lowest vec_id can never be dropped (no lower-id mate exists)
    val first = rows.minBy(_.getAs[Long]("vec_id"))
    assert(first.getAs[Boolean]("kept"))
  }

  test("embedding_outliers: z-scores standardize per label") {
    val rows = ext.Similarity.embeddingOutliers(spark, dir).collect()
    assert(rows.nonEmpty)
    val byLabel = rows.groupBy(_.getAs[Int]("label"))
    byLabel.foreach { case (_, rs) =>
      val zs = rs.map(_.getAs[Double]("z"))
      // standardized: mean ~ 0 (rounding noise only)
      assert(math.abs(zs.sum / zs.length) < 0.01)
      rs.foreach { r =>
        assert(r.getAs[Boolean]("is_outlier") == (math.abs(r.getAs[Double]("z")) > 2.0))
      }
    }
  }

  test("rrf_fusion: scores decompose into the two 1/(60+rank) terms and " +
    "fused order follows the score") {
    val rows = ext.Retrieval.rrfFusion(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 8)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
      val ordered = rs.sortBy(_.getAs[Int]("rank"))
      val scores = ordered.map(_.getAs[Double]("rrf")).toSeq
      assert(scores == scores.sorted.reverse, "fused rank must follow rrf desc")
      ordered.foreach { r =>
        val expect =
          (if (r.getAs[Int]("r_cos") <= 20) 1.0 / (60 + r.getAs[Int]("r_cos")) else 0.0) +
            (if (r.getAs[Int]("r_dot") <= 20) 1.0 / (60 + r.getAs[Int]("r_dot")) else 0.0)
        assert(r.getAs[Double]("rrf") == expect)
        assert(expect > 0, "only candidates inside at least one top-20 list emit")
      }
      // a candidate top-ranked by BOTH retrievers must be fused rank 1
      val both = rs.find(r => r.getAs[Int]("r_cos") == 1 && r.getAs[Int]("r_dot") == 1)
      both.foreach(r => assert(r.getAs[Int]("rank") == 1))
    }
  }

  test("embed_quantize: codes bounded, reconstruction error under half a " +
    "quantization step, md5 pins content") {
    val rows = ext.Similarity.embedQuantize(spark, dir).collect()
    assert(rows.length ==
      graft.ops.Tables.embeddings(spark, dir).count())
    rows.foreach { r =>
      val amax = r.getAs[Double]("amax")
      assert(amax > 0)
      // max reconstruction error of round-to-nearest is (amax/127)/2
      assert(r.getAs[Double]("recon_err") <= amax / 127.0 / 2.0 + 1e-6)
      assert(r.getAs[Int]("n_sat") >= 1,
        "the element attaining amax quantizes to exactly +/-127")
      assert(r.getAs[String]("q_md5").length == 32)
    }
    // deterministic across runs
    val again = ext.Similarity.embedQuantize(spark, dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  /** documents fixture with an EXPLICIT n_chars column (the AUC label),
    * decoupled from the text so score and label can be planted
    * independently. */
  private def aucFixture(docs: Seq[(Long, String, String, Long)]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_auc").toString
    val sp = spark
    import sp.implicits._
    docs.toDF("doc_id", "text", "lang", "n_chars")
      .withColumn("source", lit("src0"))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("classifierAuc: perfect separation scores 1.0, anti-separation 0.0") {
    // 'good' text: long, alphabetic, stopword-rich -> large positive margin;
    // 'bad' text: short, numeric, symbol-heavy -> negative margin
    val good = ("the and with have that " * 20).trim
    val bad = "# 123 456 # 789"
    val dir = aucFixture(Seq(
      (1L, good, "en", 300L), (2L, good, "en", 290L),
      (3L, bad, "en", 10L), (4L, bad, "en", 20L),
      // lang fr: labels INVERTED vs score -> AUC exactly 0
      (5L, good, "fr", 10L), (6L, bad, "fr", 300L)))
    val out = ext.Retrieval.classifierAuc(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("en") == ((2L, 2L, 1.0)))
    assert(out("fr") == ((1L, 1L, 0.0)))
    // pooled: positives {1,2,6}, negatives {3,4,5} over two distinct
    // scores (good g > bad b): 4 clean wins, 4 same-score ties (half
    // credit), 1 loss -> AUC = (4 + 4·0.5) / 9 = 0.666667
    assert(out("all") == ((3L, 3L, 0.666667)))
  }

  test("classifierAuc: all-tied scores give exactly 0.5 (average-rank ties)") {
    val same = "identical text for every document here"
    val dir = aucFixture(Seq(
      (1L, same, "en", 300L), (2L, same, "en", 300L),
      (3L, same, "en", 10L), (4L, same, "en", 10L)))
    val out = ext.Retrieval.classifierAuc(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("en") == 0.5)
    assert(out("all") == 0.5)
  }
}
