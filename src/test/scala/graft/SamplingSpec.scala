package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sampling / split-hygiene ops (`ext.Sampling`) + tf-idf and hard-example
  * mining, on the sf0.001 fixtures. Oracle parity is the driver's job;
  * these pin the semantic invariants. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  test("split_leakage: seeded leaks detected, none reported from train") {
    val rows = ext.Sampling.splitLeakage(spark, dir).collect()
    assert(rows.nonEmpty, "seeding guarantees leaked eval docs")
    rows.foreach { r =>
      assert(r.getAs[String]("split") != "train")
      assert(r.getAs[Long]("n_train_dups") >= 1)
    }
  }

  test("lang_temperature: flattens the distribution — low-resource langs " +
    "keep a larger share than their raw proportion") {
    val rows = ext.Sampling.langTemperature(spark, dir).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang")).map { case (l, rs) =>
      val n = rs.head.getAs[Long]("n_lang")
      val sel = rs.count(_.getAs[Boolean]("selected"))
      (l, n, sel)
    }.toSeq
    // selected counts match each lang's n_sel target
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val nSel = rs.head.getAs[Long]("n_sel")
      assert(rs.count(_.getAs[Boolean]("selected")) == nSel)
    }
    // temperature flattening: sampling rate (sel/n) strictly higher for
    // the smallest language than for the largest
    val biggest = byLang.maxBy(_._2)
    val smallest = byLang.minBy(_._2)
    assert(biggest._2 > smallest._2, "fixture should have imbalanced langs")
    assert(smallest._3.toDouble / smallest._2 > biggest._3.toDouble / biggest._2,
      s"α=1/2 must upsample low-resource langs: $byLang")
  }

  test("weighted_sample: k rows, heavier docs overrepresented vs uniform") {
    val rows = ext.Sampling.weightedSample(spark, dir).collect()
    assert(rows.length == 50)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 50))
    val sampleMean = rows.map(_.getAs[Long]("n_chars")).sum.toDouble / rows.length
    val corpusMean = graft.ops.Tables.documents(spark, dir)
      .agg(org.apache.spark.sql.functions.avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      f"E-S keys weight by n_chars; sample mean $sampleMean%.1f should exceed corpus mean $corpusMean%.1f")
  }

  test("corpus_release: manifest covers every lang, totals consistent, " +
    "counts bounded by the raw corpus") {
    val rows = ext.Sampling.corpusRelease(spark, dir).collect()
    assert(rows.nonEmpty)
    val langs = rows.map(_.getAs[String]("lang")).distinct.sorted.toSeq
    assert(langs.size > 1, "release should span languages")
    rows.foreach { r =>
      assert(Seq("train", "val", "test").contains(r.getAs[String]("split")))
      assert(r.getAs[Long]("n_docs") > 0)
      assert(r.getAs[Long]("total_tokens") >= 50 * r.getAs[Long]("n_docs"),
        "curation floor: every released doc has >= 50 tokens")
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val corpus = graft.ops.Tables.documents(spark, dir).count()
    assert(total <= corpus, "release can never exceed the raw corpus")
  }

  test("tfidf_keywords: top terms per doc, ranks dense, corpus-wide terms score 0") {
    val rows = ext.Retrieval.tfidfKeywords(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
      val scores = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("tfidf")).toSeq
      assert(scores == scores.sorted.reverse)
    }
    // a term appearing in EVERY doc has idf ln(1)=0
    rows.filter(r => r.getAs[Long]("df") == 500L)
      .foreach(r => assert(r.getAs[Double]("tfidf") == 0.0))
  }

  test("curation_audit: stage precedence — exact dups cite a kept twin, " +
    "every doc gets exactly one verdict, audit covers the whole corpus") {
    val rows = ext.Sampling.curationAudit(spark, dir, minTok = 15, perLangCap = 150)
      .collect()
    assert(rows.length == graft.ops.Tables.documents(spark, dir).count())
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    rows.foreach { r =>
      val stage = r.getAs[String]("stage")
      assert(Seq("kept", "exact_dup", "quality", "lang_cap").contains(stage))
      assert(r.getAs[Boolean]("kept") == (stage == "kept"))
      if (stage == "exact_dup") {
        val rep = r.getAs[Long]("evidence")
        assert(rep >= 0 && rep < r.getAs[Long]("doc_id"),
          "evidence must be the LOWER surviving twin")
        assert(byId(rep).getAs[String]("stage") != "exact_dup",
          "the cited representative itself must not be an exact dup")
      } else assert(r.getAs[Long]("evidence") == -1L)
    }
  }

  test("histogram_quantiles: estimates within one bin width of the exact " +
    "quantile, monotone in q") {
    val rows = ext.CorpusOps.histogramQuantiles(spark, dir).collect()
    assert(rows.nonEmpty)
    val exact = graft.ops.Tables.documents(spark, dir)
      .select("lang", "n_chars").collect()
      .groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.map(_.getAs[Long]("n_chars")).sorted).toMap
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val byQ = rs.map(r => r.getAs[Double]("q") -> r.getAs[Double]("est")).toMap
      assert(byQ(0.5) <= byQ(0.9), "quantile estimates must be monotone in q")
      byQ.foreach { case (q, est) =>
        val vals = exact(lang)
        val ex = vals(math.min(vals.length - 1, math.ceil(q * vals.length).toInt - 1))
        assert(math.abs(est - ex) <= 50.0 + 1e-9,
          s"$lang q=$q est=$est exact=$ex drifted beyond the bin-width bound")
      }
    }
  }

  test("hard_examples: one negative and one positive per query, labels correct") {
    val rows = ext.Similarity.hardExamples(spark, dir).collect()
    val e = graft.ops.Tables.embeddings(spark, dir)
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 8)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[String]("kind")).sorted.toSeq ==
        Seq("hard_negative", "hard_positive"))
      rs.foreach { r =>
        val sameLabel = e(r.getAs[Long]("neighbor_id")) == e(q)
        assert(sameLabel == (r.getAs[String]("kind") == "hard_positive"))
      }
    }
  }

  test("dedup_canonical: one winner per multi-member group, winner has the " +
    "group's best (ttr, -doc_id) key") {
    val rows = ext.Sampling.dedupCanonical(spark, dir).collect()
    assert(rows.nonEmpty, "fixtures carry exact-dup groups")
    val keys = rows.map(_.getAs[String]("set_key"))
    assert(keys.distinct.length == keys.length, "one row per group")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") >= 2)
      assert(r.getAs[Long]("canonical_id") >= r.getAs[Long]("min_id"))
      assert(r.getAs[Boolean]("beats_first_copy") ==
        (r.getAs[Long]("canonical_id") != r.getAs[Long]("min_id")))
    }
    // cross-check the winner against a direct recomputation for one group
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id",
        "md5(array_join(array_sort(array_distinct(split(text, ' '))), '\u0001')) AS k",
        "size(array_distinct(split(text, ' '))) / cast(size(split(text, ' ')) AS DOUBLE) AS ttr")
      .collect().groupBy(_.getAs[String]("k"))
    rows.take(5).foreach { r =>
      val grp = docs(r.getAs[String]("set_key"))
      val best = grp.maxBy(g => (g.getAs[Double]("ttr"), -g.getAs[Long]("doc_id")))
      assert(best.getAs[Long]("doc_id") == r.getAs[Long]("canonical_id"))
    }
  }

  test("token_budget_select: greedy prefix by quality exactly fills the " +
    "budget — adding the next-ranked doc would exceed it") {
    val rows = ext.Sampling.tokenBudgetSelect(spark, dir).collect()
    assert(rows.nonEmpty)
    val budget = rows.head.getAs[Long]("budget")
    val last = rows.maxBy(_.getAs[Int]("sel_rank"))
    assert(last.getAs[Long]("cum_tokens") <= budget)
    // ranks are the dense prefix 1..n (no holes — a hole would mean a
    // skipped better doc)
    assert(rows.map(_.getAs[Int]("sel_rank")).sorted.toSeq ==
      (1 to rows.length).toSeq)
    // cum_tokens is consistent with the per-row n_tok running sum
    val ordered = rows.sortBy(_.getAs[Int]("sel_rank"))
    var acc = 0L
    ordered.foreach { r =>
      acc += r.getAs[Int]("n_tok")
      assert(r.getAs[Long]("cum_tokens") == acc)
    }
    // maximality: the corpus has more docs than selected (budget binds)
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length < total)
  }

  test("dpo_pairs: k disjoint best-vs-worst pairs per qualifying lang, " +
    "margins non-negative and rank-monotone") {
    val k = 8
    val rows = ext.Sampling.dpoPairs(spark, dir, k).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (lang, ps) =>
      assert(ps.length === k, s"$lang: expected $k pairs")
      assert(ps.map(_.getInt(1)).sorted === (1 to k).toArray, s"$lang: ranks not dense")
      val chosen = ps.map(_.getLong(2)).toSet
      val rejected = ps.map(_.getLong(3)).toSet
      assert(chosen.intersect(rejected).isEmpty, s"$lang: chosen/rejected overlap")
      ps.foreach { r =>
        assert(r.getDouble(6) >= 0.0, s"$lang: negative margin (rejected beat chosen)")
        // margin rounds the EXACT difference; the displayed scores round
        // individually — they can disagree by one 6-dp ulp
        assert(math.abs(r.getDouble(4) - r.getDouble(5) - r.getDouble(6)) < 1.1e-6)
      }
      // rank 1 pairs the best with the worst: margins shrink with rank
      val byRank = ps.sortBy(_.getInt(1)).map(_.getDouble(6))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b - 1e-9 },
        s"$lang: margin not monotone in rank")
    }
  }

  test("dsir_weights: ranks dense and ordered, selection enriches the " +
    "target domain above the corpus base rate") {
    val rows = ext.Sampling.dsirWeights(spark, dir).collect()
    assert(rows.length == 50)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 50))
    val ws = rows.map(_.getAs[Double]("log_w")).toSeq
    assert(ws == ws.sorted.reverse, "log_w must be non-increasing by rank")
    // importance resampling toward lang='en' must actually enrich:
    // the selected set's en fraction strictly exceeds the corpus's
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val selEn = rows.count(r => docs(r.getAs[Long]("doc_id")) == "en").toDouble / 50
    val baseEn = docs.valuesIterator.count(_ == "en").toDouble / docs.size
    assert(selEn > baseEn,
      s"DSIR top-50 en fraction $selEn must beat base rate $baseEn")
  }

  test("dsir_weights: a doc's weight replays from the bucket model by hand") {
    // independent replay: recompute bucket log-ratios and one doc's
    // weight driver-side from raw tokens (same md5 recipe), compare
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bkt(t: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 15), 16) % 64
    }
    val all = docs.flatMap { case (_, lang, text) =>
      text.split(" ", -1).map(t => (bkt(t), lang)) }
    val cr = all.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ct = all.filter(_._2 == "en").groupBy(_._1)
      .view.mapValues(_.length.toLong).toMap
    val (tr, tt) = (cr.values.sum.toDouble, ct.values.sum.toDouble)
    val lr = cr.keys.map { b =>
      val l = math.log((ct.getOrElse(b, 0L) + 1) / (tt + 64.0)) -
        math.log((cr(b) + 1) / (tr + 64.0))
      b -> BigDecimal(l).setScale(15, BigDecimal.RoundingMode.HALF_UP)
    }.toMap
    val rows = ext.Sampling.dsirWeights(spark, dir).collect()
    rows.take(5).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val text = docs.find(_._1 == id).get._3
      val expect = text.split(" ", -1).map(t => lr(bkt(t))).sum.toDouble
      assert(math.abs(r.getAs[Double]("log_w") - expect) < 1e-6,
        s"doc $id: engine ${r.getAs[Double]("log_w")} vs replay $expect")
    }
  }

  test("k_anonymity: plain-Scala ladder replay; risk is monotone in generalization") {
    val k = 5
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), col("source"), col("n_chars")).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars") / 256))
    def level(keyOf: ((String, String, Long)) => Product): (Long, Long, Long) = {
      val groups = docs.groupBy(keyOf).values.map(_.length.toLong)
      (groups.size.toLong, groups.count(_ < k).toLong,
        groups.filter(_ < k).sum)
    }
    val want = Seq(
      level(t => (t._1, t._2, t._3)), level(t => (t._1, t._2)),
      level(t => Tuple1(t._1)), level(_ => Tuple1(())))
    val rows = ext.Sampling.kAnonymity(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("level")).toSeq == Seq(0, 1, 2, 3))
    rows.zip(want).foreach { case (r, (ng, nsm, risk)) =>
      assert(r.getAs[Long]("n_groups") == ng, s"level ${r.getAs[Int]("level")} n_groups")
      assert(r.getAs[Long]("n_small_groups") == nsm)
      assert(r.getAs[Long]("docs_at_risk") == risk)
      assert(r.getAs[Boolean]("k_anonymous") == (nsm == 0))
    }
    // suppressing a QI column merges groups, so group sizes only grow:
    // docs_at_risk must be non-increasing down the ladder, ending at 0
    val risks = rows.map(_.getAs[Long]("docs_at_risk")).toSeq
    assert(risks == risks.sorted(Ordering[Long].reverse), s"risk not monotone: $risks")
    assert(risks.last == 0L, "the fully-suppressed level is always k-anonymous")
  }

  test("l_diversity: plain-Scala per-class replay; distinct-fail implies " +
    "entropy-fail (H <= ln(n_distinct))") {
    val l = 3
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang"),
        r.getAs[Long]("n_chars") / 256))
    val want = docs.groupBy(t => (t._1, t._3)).map { case ((src, _), members) =>
      val byLang = members.groupBy(_._2).view.mapValues(_.length).toMap
      val n = members.length.toDouble
      val h = math.rint(byLang.values.map { c =>
        -(c / n) * math.log(c / n)
      }.sum * 1e6) / 1e6
      (src, byLang.size < l, h < 1.098612, members.length.toLong)
    }.toSeq.groupBy(_._1).map { case (src, cls) =>
      src -> ((cls.length.toLong, cls.count(_._2).toLong, cls.count(_._3).toLong,
        cls.filter(c => c._2 || c._3).map(_._4).sum))
    }
    val rows = ext.Sampling.lDiversity(spark, dir).collect()
    rows.foreach { r =>
      val (ng, nld, nle, risk) = want(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_groups") == ng)
      assert(r.getAs[Long]("n_low_distinct") == nld)
      assert(r.getAs[Long]("n_low_entropy") == nle)
      assert(r.getAs[Long]("docs_at_risk") == risk)
      assert(r.getAs[Boolean]("l_diverse") == (nld == 0 && nle == 0))
      // H <= ln(n_distinct): a class failing distinct-l must fail entropy-l
      assert(nle >= nld, s"${r.getAs[String]("source")}: entropy check weaker than distinct")
    }
  }
}
