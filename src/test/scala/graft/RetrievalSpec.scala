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

  test("classifierCalibration: bins partition the corpus, conf stays in " +
    "its bin, ECE = 0 on a perfectly calibrated planted fixture") {
    val rows = ext.Retrieval.classifierCalibration(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total,
      "bins must partition the corpus exactly")
    rows.foreach { r =>
      val (bin, conf, acc) = (r.getAs[Int]("bin"),
        r.getAs[Double]("conf"), r.getAs[Double]("acc"))
      assert(bin >= 0 && bin <= 9)
      assert(conf >= bin / 10.0 - 1e-6 && conf <= (bin + 1) / 10.0 + 1e-6,
        s"bin $bin mean confidence $conf escaped its bucket")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(math.abs(r.getAs[Double]("gap")
        - math.abs((acc * 1e6).round / 1e6 - (conf * 1e6).round / 1e6)) < 2e-6)
    }
    // planted: saturated-score docs that ARE all positive, and
    // bottom-score docs that ARE all negative → both bins perfectly
    // calibrated, ECE ≈ 0
    val good = ("the and with have that " * 40).trim // huge margin → s≈1
    val bad = "# 11 22 # 33" // negative margin → s≈0
    val d2 = aucFixture(Seq(
      (1L, good, "en", 300L), (2L, good, "en", 290L),
      (3L, bad, "en", 10L), (4L, bad, "en", 20L)))
    val cal = ext.Retrieval.classifierCalibration(spark, d2).collect()
    val ece = cal.map(_.getAs[Double]("wgap")).sum
    assert(ece < 1e-3, s"perfectly calibrated fixture must have ECE≈0, got $ece")
  }

  test("retrieval_eval: metric ranges, and hits replay from an " +
    "independent brute-force top-10 joined to labels") {
    val rows = ext.Retrieval.retrievalEval(spark, dir).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val (nRel, hits) = (r.getAs[Long]("n_rel"), r.getAs[Long]("hits"))
      assert(hits <= math.min(10L, nRel))
      assert(r.getAs[Double]("p_at_k") == hits.toDouble / 10)
      val ndcg = r.getAs[Double]("ndcg")
      assert(ndcg >= 0.0 && ndcg <= 1.0)
      assert((ndcg == 0.0) == (hits == 0L), "nDCG zero iff no top-k hit")
      val mrr = r.getAs[Double]("mrr")
      assert(mrr > 0.0 && mrr <= 1.0)
      if (hits > 0) assert(mrr >= 1.0 / 10,
        "a top-10 hit bounds the first relevant rank at 10")
    }
    // independent path: brute-force top-10 ranks joined to labels must
    // reproduce the hit counts exactly
    val labels = graft.ops.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val brute = ext.Similarity.bruteForceTopK(spark, dir, numQueries = 8, k = 10)
      .collect()
    val expectHits = brute.groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.count(r =>
        labels(r.getAs[Long]("neighbor_id")) == labels(r.getAs[Long]("query_id"))))
      .toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("hits") ==
        expectHits(r.getAs[Long]("query_id")).toLong)
    }
  }

  test("mmr_select: dense steps, no repeats, greedy sequence replays " +
    "by hand from the collected pool, scores non-increasing") {
    val rows = ext.Retrieval.mmrSelect(spark, dir).collect()
    assert(rows.length == 20) // 4 queries x 5 steps
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L))
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getAs[Int]("step")).sorted.toSeq == (1 to 5))
      val ids = rs.map(_.getAs[Long]("cand_id"))
      assert(ids.distinct.length == 5, s"query $qid repeats a candidate")
      val mmrs = rs.sortBy(_.getAs[Int]("step")).drop(1)
        .map(_.getAs[Double]("mmr"))
      assert(mmrs.toSeq == mmrs.sorted.reverse.toSeq,
        s"query $qid: MMR scores must be non-increasing over steps")
      assert(rs.find(_.getAs[Int]("step") == 1)
        .get.isNullAt(rs.head.fieldIndex("mmr")),
        "step 1 is the pure-relevance seed; it has no MMR score")
    }
    // hand replay for one query: greedy argmax over the collected pool
    val e = graft.ops.Tables.embeddings(spark, dir).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i) * y(i); i += 1 }; s
      }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val qid = 2L
    val qe = e(qid)
    val pool = e.keys.filter(_ != qid).map(id => id -> cos(qe, e(id))).toSeq
      .sortBy { case (id, rel) => (-rel, id) }.take(20)
    var sel = List(pool.head._1)
    for (_ <- 2 to 5) {
      val pick = pool.filterNot { case (id, _) => sel.contains(id) }
        .map { case (id, rel) =>
          val msim = sel.map(s => cos(e(id), e(s))).max
          (id, 0.7 * rel - 0.3 * msim)
        }.minBy { case (id, m) => (-m, id) }._1
      sel = sel :+ pick
    }
    val engineSeq = byQ(qid).sortBy(_.getAs[Int]("step"))
      .map(_.getAs[Long]("cand_id")).toSeq
    assert(engineSeq == sel, s"greedy replay mismatch: $engineSeq vs $sel")
  }

  test("marginMining: even->odd pairing, dense ranks, margin-desc order, " +
    "top pair matches a driver-side brute-force replay") {
    val rows = ext.Similarity.marginMining(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    assert(rows.forall(r => r.getAs[Long]("x_id") % 2 == 0))
    assert(rows.forall(r => r.getAs[Long]("y_id") % 2 == 1))
    val ms = rows.map(_.getAs[Double]("margin")).toSeq
    assert(ms == ms.sorted.reverse)
    // x proposes at most once (forward selection)
    val xs = rows.map(_.getAs[Long]("x_id"))
    assert(xs.distinct.length == xs.length)
    // brute-force replay of the rank-1 proposal
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      math.rint(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))) * 1e6) / 1e6
    }
    val evens = e.keys.filter(_ % 2 == 0).toSeq.sorted
    val odds = e.keys.filter(_ % 2 == 1).toSeq.sorted
    def nnAvg(id: Long, others: Seq[Long]): Double = {
      val top = others.map(o => (cos(e(id), e(o)), o)).sortBy { case (c, o) => (-c, o) }.take(4)
      top.map(_._1).sum / top.length
    }
    val best = (for (x <- evens; y <- odds.map(o => (cos(e(x), e(o)), o))
           .sortBy { case (c, o) => (-c, o) }.take(4))
      yield (x, y._2, y._1 / ((nnAvg(x, odds) + nnAvg(y._2, evens)) / 2.0)))
      .groupBy(_._1).map(_._2.maxBy(t => (t._3, -t._2))).maxBy(t => (t._3, -t._1))
    assert((rows.head.getAs[Long]("x_id"), rows.head.getAs[Long]("y_id")) ==
      ((best._1, best._2)),
      s"rank-1 ${rows.head} != brute-force ${best}")
  }

  test("embeddingPca: unit component, lambda bounds, and a driver-side " +
    "two-iteration power replay agrees") {
    val rows = ext.Similarity.embeddingPca(spark, dir).collect()
    assert(rows.length == 64)
    val pc = rows.sortBy(_.getAs[Int]("d")).map(_.getAs[Double]("pc1"))
    assert(math.abs(pc.map(x => x * x).sum - 1.0) < 64e-6, "pc1 must be unit")
    val lam = rows.head.getAs[Double]("lambda")
    val vf = rows.head.getAs[Double]("var_frac")
    assert(lam > 0 && vf > 0 && vf <= 1.0)
    // exact replay of the fixed trajectory
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("embedding")).collect()
      .map(_.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
    val n = e.length
    val dim = 64
    val mu = (0 until dim).map(d => e.map(_(d)).sum / n)
    val cx = e.map(v => (0 until dim).map(d => v(d) - mu(d)).toArray)
    var v = (0 until dim).map(d => if (d % 2 == 0) 1.0 else -1.0).toArray
    for (_ <- 1 to 2) {
      val dots = cx.map(x => x.indices.map(d => x(d) * v(d)).sum)
      val w = (0 until dim).map(d => cx.indices.map(i => dots(i) * cx(i)(d)).sum)
      val s = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / s).toArray
    }
    // driver replay sums in arbitrary-but-fixed order vs the engine's
    // DECIMAL sums — agree to well inside the display rounding
    pc.zip(v).foreach { case (a, b) => assert(math.abs(a - b) < 1e-4,
      s"pc1 component $a vs replay $b") }
  }

  test("abttCorrect: per-query dense ranks ordered by corrected sim; " +
    "correction removes the top-PC direction (projection ~ 0)") {
    val rows = ext.Similarity.abttCorrect(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      val sims = sorted.map(_.getAs[Double]("sim_corrected")).toSeq
      assert(sims == sims.sorted.reverse)
    }
    // the corrected corpus must be orthogonal to the learned direction:
    // recompute (mu, v) independently via the graded PCA query and check
    // a corrected vector's projection onto v vanishes
    val pca = ext.Similarity.embeddingPca(spark, dir).collect()
      .sortBy(_.getAs[Int]("d"))
    val mu = pca.map(_.getAs[Double]("mu"))
    val v = pca.map(_.getAs[Double]("pc1"))
    val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("embedding")).limit(3).collect()
      .map(_.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
    e0.foreach { x =>
      val cx = x.indices.map(d => x(d) - mu(d))
      val dot = cx.indices.map(d => cx(d) * v(d)).sum
      val cc = cx.indices.map(d => cx(d) - dot * v(d))
      val resid = cc.indices.map(d => cc(d) * v(d)).sum
      // mu/v are 6-dp-rounded outputs, so orthogonality holds to ~1e-4
      assert(math.abs(resid) < 1e-3, s"projection after correction: $resid")
    }
  }

  test("classifierTrain: trace shape, bias gradient = mean residual, and " +
    "weights accumulate lr-scaled gradients") {
    val rows = ext.Retrieval.classifierTrain(spark, dir).collect()
    assert(rows.length == 14) // 2 iterations x 7 coordinates
    val byKey = rows.map(r => (r.getAs[Int]("iter"), r.getAs[Int]("d")) ->
      ((r.getAs[Double]("grad"), r.getAs[Double]("weight")))).toMap
    assert(byKey.keySet == (for (i <- 1 to 2; d <- 0 to 6) yield (i, d)).toSet)
    // bias coordinate (x0 = 1): iter-1 gradient is exactly mean(y) - 0.5
    // because w = 0 forces sigma(0) = 1/2 for every row
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count().toDouble
    val nPos = docs.filter(col("n_chars") >= 256).count().toDouble
    assert(math.abs(byKey((1, 0))._1 - (nPos / n - 0.5)) < 1e-6,
      s"bias gradient ${byKey((1, 0))._1} != ${nPos / n - 0.5}")
    // each weight is the lr-scaled running sum of its gradients
    (0 to 6).foreach { d =>
      assert(math.abs(byKey((1, d))._2 - 0.5 * byKey((1, d))._1) < 1e-8)
      assert(math.abs(byKey((2, d))._2 -
        (byKey((1, d))._2 + 0.5 * byKey((2, d))._1)) < 1e-8)
    }
    // training moved the bias toward the positive-rate prior
    assert(byKey((2, 0))._2 != 0.0)
  }
}
