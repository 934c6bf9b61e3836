package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Tables._

/** Retrieval and model-based curation operators over the `documents`
  * table: BM25 lexical ranking (the retrieval primitive behind
  * RAG-corpus construction and dedup-by-retrieval), asymmetric n-gram
  * containment dedup (doc-quoted-inside-doc detection), and a
  * linear quality classifier (the fastText-style scorer pipelines run
  * after the heuristic Gopher/C4 rules).
  *
  * All three are oracle-hashed end-to-end: scoring arithmetic is
  * arranged identically on the Spark and DuckDB sides (integer corpus
  * statistics, single-division ratios, per-row fp folds), with rounding
  * only where a genuine float reduction (ln, sigmoid, windowed moments)
  * could differ in the last ulp between engines. */
object Retrieval {

  private val toks = split(col("text"), " ")

  // ---- BM25 ----------------------------------------------------------

  /** The published Lucene/Robertson BM25 parameters. */
  private val k1 = 1.2
  private val b = 0.75

  /** Fixed query terms — literals on both sides (a real pipeline passes
    * its query batch; scoring shape is identical per query). */
  private val bm25Terms = Seq("merge", "vector", "slow")

  /** BM25 top-k document retrieval for a literal term set.
    *
    * Scale shape: corpus statistics (N, Σdl, per-term document
    * frequencies) reduce in ONE partial-combine aggregation to a single
    * metadata row that joins back by broadcast — no per-term shuffle, no
    * inverted index materialization for a bounded query set. Per-doc
    * term frequencies are map-side array filters over the token array
    * (codegen'd HOFs). The only other shuffle is the final top-k
    * (rank window over one global ordering of score-filtered docs — at
    * 100 TB the filter `score > 0` first drops every doc containing no
    * query term, so the ordered set is the posting-list union, not the
    * corpus). Determinism: N, df, dl, Σdl are integers (bit-exact on
    * both engines); idf/score involve `ln` and float division, so the
    * ranking key is the 4-decimal ROUNDED score (then doc_id) — a
    * last-ulp `ln` difference between engines cannot reorder rows. */
  def bm25TopK(spark: SparkSession, dir: String, topN: Int = 20): DataFrame = {
    val d = documents(spark, dir).select(col("doc_id"), toks.as("t"))
      .withColumn("dl", size(col("t")))
    val statAggs =
      count(lit(1)).cast(DoubleType).as("n_docs") +:
        sum(col("dl")).cast(DoubleType).as("sum_dl") +:
        bm25Terms.zipWithIndex.map { case (term, i) =>
          sum(array_contains(col("t"), term).cast(IntegerType))
            .cast(DoubleType).as(s"df$i")
        }
    val stats = d.agg(statAggs.head, statAggs.tail: _*)
    val scored = d.crossJoin(broadcast(stats))
    val termScores = bm25Terms.zipWithIndex.map { case (term, i) =>
      val tf = size(filter(col("t"), x => x === term)).cast(DoubleType)
      val idf = log(((col("n_docs") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5)) + 1.0)
      val avgdl = col("sum_dl") / col("n_docs")
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    }
    // distributed top-k (TakeOrderedAndProject) FIRST, then the rank
    // window runs over topN rows only — never a whole-corpus single
    // -partition sort
    val top = scored
      .select(col("doc_id"), col("dl").as("n_tok"),
        round(termScores.reduce(_ + _), 4).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .orderBy("rank")
  }

  private def bm25Oracle(topN: Int = 20): String = {
    val dfAggs = bm25Terms.zipWithIndex.map { case (t, i) =>
      s"CAST(sum(CASE WHEN list_contains(t, '$t') THEN 1 ELSE 0 END) AS DOUBLE) AS df$i"
    }.mkString(",\n  ")
    val termScores = bm25Terms.zipWithIndex.map { case (t, i) =>
      s"""ln(((n_docs - df$i + 0.5) / (df$i + 0.5)) + 1.0)
         |      * (CAST(len(list_filter(t, x -> x = '$t')) AS DOUBLE) * ${k1 + 1.0})
         |      / (CAST(len(list_filter(t, x -> x = '$t')) AS DOUBLE)
         |         + $k1 * (${1.0 - b} + $b * dl / (sum_dl / n_docs)))""".stripMargin
    }.mkString("\n    + ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t,
       |                  len(string_split(text, ' ')) AS dl FROM documents),
       |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |  CAST(sum(dl) AS DOUBLE) AS sum_dl,
       |  $dfAggs
       |FROM d),
       |sc AS (SELECT doc_id, CAST(dl AS INT) AS n_tok,
       |  ROUND($termScores, 4) AS score
       |FROM d, st)
       |SELECT doc_id, n_tok, score, CAST(rn AS INT) AS rank FROM (
       |  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rn
       |  FROM sc WHERE score > 0)
       |WHERE rn <= $topN ORDER BY rank""".stripMargin
  }

  // ---- tf-idf keyword extraction -------------------------------------

  /** Per-document tf-idf keyword extraction — the classic corpus-level
    * term weighting (keyword tagging, topic drift monitoring, BM25's
    * ancestor): tfidf(t, d) = tf(t, d) · ln(N / df(t)), top `topK` terms
    * per doc.
    *
    * Scale shape: one explode → (doc, term) partial-combine count; df
    * comes from a term-keyed agg OVER THE TF TABLE (already one row per
    * (doc, term) — never a second pass over the corpus); N broadcasts as
    * a one-row stat. The per-doc top-k is a window over the doc-keyed
    * shuffle. Ranking key is the ROUNDED score (ln is libm), then term. */
  def tfidfKeywords(spark: SparkSession, dir: String, topK: Int = 3): DataFrame = {
    val tf = documents(spark, dir)
      .select(col("doc_id"), explode(toks).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = documents(spark, dir).agg(count(lit(1)).cast(DoubleType).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(dfT, "term").crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(col("tf") * log(col("n_docs") / col("df")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"), col("rank"))
      .orderBy("doc_id", "rank")
  }

  private def tfidfOracle(topK: Int = 3): String =
    s"""WITH tf AS (SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
       |  GROUP BY doc_id, term),
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
       |s AS (SELECT tf.doc_id, tf.term, tf.tf, dft.df,
       |        ROUND(tf.tf * ln(n.n_docs / dft.df), 4) AS tfidf
       |      FROM tf JOIN dft USING (term), n)
       |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       |       tfidf, CAST(rn AS INT) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY tfidf DESC, term) AS rn FROM s)
       |WHERE rn <= $topK ORDER BY doc_id, rank""".stripMargin

  // ---- containment dedup ---------------------------------------------

  /** Asymmetric n-gram containment dedup — "is doc A substantially
    * quoted inside doc B": containment(A, B) = |grams(A) ∩ grams(B)| /
    * |grams(A)| over distinct word 8-grams, flagged at ≥ 0.8. Catches
    * the subset/superset duplicates symmetric Jaccard misses (a short
    * doc fully embedded in a long one has tiny Jaccard but containment
    * 1.0) — the RealNews/C4 quote-dedup shape.
    *
    * Scale shape: grams explode once; candidate pairs come from the
    * gram-keyed equi-join, so only pairs SHARING a gram are ever
    * scored — no all-pairs stage. Grams whose corpus document frequency
    * exceeds `maxGramDf` are boilerplate (every doc pair would share
    * them): they're dropped BEFORE the pair join, capping any join
    * bucket at maxGramDf² — the same hot-bucket bound as the LSH
    * mega-bucket cap, mirrored exactly in the oracle so the definition
    * stays hash-checked. Containment itself is a single integer/integer
    * division — bit-exact on both engines, no rounding needed. */
  def containmentDedup(spark: SparkSession, dir: String, n: Int = 8,
                       thresh: Double = 0.8, maxGramDf: Int = 50): DataFrame =
    containmentDedupDocs(documents(spark, dir), n, thresh, maxGramDf)

  /** [[containmentDedup]] core over any (doc_id, text) frame — split out
    * so the df-cap (hot-bucket bound) semantics are unit-testable on
    * synthetic boilerplate corpora. */
  def containmentDedupDocs(docs: DataFrame, n: Int = 8,
                           thresh: Double = 0.8, maxGramDf: Int = 50): DataFrame = {
    val d = docs.select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= n)
    // the exploded gram table feeds FOUR consumers (per-doc counts, the
    // df filter, both sides of the pair join) — persist so the documents
    // scan + n-gram assembly runs once, unpersisted before return (the
    // result is materialized by an eager localCheckpoint, so nothing
    // stays in the session cache).
    //
    // Grams are hashed to a 60-bit integer BEFORE the persist and the
    // pair join: raw 8-gram strings average 50-100 bytes and dominated
    // the persist + two shuffle legs (the r5 driver bench measured this
    // query spilling at 33 s); a fixed-width long cuts those bytes ~10×.
    // The hash is the engine-portable md5-prefix integer (same domain
    // trick as minhash_md5), mirrored digit-for-digit in the oracle, so
    // the query stays hash-checked — a collision folds two grams into
    // one identically on both engines.
    val grams = d.select(col("doc_id"), explode(array_distinct(
      transform(sequence(lit(0), size(col("t")) - n),
        i => conv(substring(md5(
          concat_ws(" ", slice(col("t"), i + 1, lit(n)))), 1, 15), 16, 10)
          .cast(LongType)))).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val ng = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      val live = grams.join(
        grams.groupBy("g").agg(count(lit(1)).as("gdf")).filter(col("gdf") <= maxGramDf)
          .select("g"),
        "g").select(col("g"), col("doc_id"))
      val shared = live.select(col("g"), col("doc_id").as("a_id"))
        .join(live.select(col("g"), col("doc_id").as("b_id")), "g")
        .filter(col("a_id") =!= col("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("shared_grams"))
      shared.join(ng.toDF("a_id", "n_grams_a"), "a_id")
        .withColumn("containment",
          col("shared_grams").cast(DoubleType) / col("n_grams_a"))
        .filter(col("containment") >= thresh)
        .select(col("a_id"), col("b_id"), col("shared_grams"),
          col("n_grams_a"), col("containment"))
        .orderBy("a_id", "b_id")
        .localCheckpoint(true)
    } finally grams.unpersist()
  }

  /** DuckDB mirror of Spark's `conv(substring(md5(g),1,15),16,10)` —
    * the 60-bit md5-prefix gram hash, assembled digit-by-digit with
    * integer arithmetic (same portable-hash recipe as minhash_md5).
    * `expr` must already be the md5 hex string (computed once in a CTE). */
  private def md5Prefix60Sql(expr: String): String =
    (0 until 15).map(i =>
      s"(strpos('0123456789abcdef', substring($expr, ${i + 1}, 1)) - 1) * ${1L << (4 * (14 - i))}")
      .mkString("(", " + ", ")")

  private def containmentOracle(n: Int = 8, thresh: Double = 0.8,
                                maxGramDf: Int = 50): String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |            WHERE len(string_split(text, ' ')) >= $n),
       |g0 AS (SELECT DISTINCT doc_id,
       |        md5(array_to_string(t[CAST(i AS INT):CAST(i + ${n - 1} AS INT)], ' ')) AS h
       |      FROM tk, UNNEST(generate_series(1, len(t) - ${n - 1})) u(i)),
       |g AS (SELECT DISTINCT doc_id, ${md5Prefix60Sql("h")} AS g FROM g0),
       |ng AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
       |live AS (SELECT g.* FROM g JOIN (
       |    SELECT g, count(*) AS gdf FROM g GROUP BY g HAVING count(*) <= $maxGramDf
       |  ) f USING (g)),
       |sh AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared_grams
       |       FROM live a JOIN live b ON a.g = b.g AND a.doc_id <> b.doc_id
       |       GROUP BY 1, 2)
       |SELECT sh.a_id, sh.b_id, CAST(sh.shared_grams AS BIGINT) AS shared_grams,
       |       CAST(ng.n_grams AS BIGINT) AS n_grams_a,
       |       CAST(sh.shared_grams AS DOUBLE) / ng.n_grams AS containment
       |FROM sh JOIN ng ON ng.doc_id = sh.a_id
       |WHERE CAST(sh.shared_grams AS DOUBLE) / ng.n_grams >= $thresh
       |ORDER BY a_id, b_id""".stripMargin

  // ---- sketch containment (the 100 TB containment path) --------------

  /** Bottom-k sketch containment — [[containmentDedup]]'s scale path:
    * instead of joining EVERY gram of every doc, each probe doc ships
    * only its k smallest md5 gram hashes and joins them against the
    * (df-capped) corpus gram index; containment(A, B) is estimated as
    * |{s ∈ bottom-k(A) : s ∈ grams(B)}| / min(k, |grams(A)|) — an
    * unbiased estimate under uniform hashing, and EXACT (no false
    * negatives) for full containment PROVIDED none of A's bottom-k grams
    * is df-capped: if A ⊆ B every bottom-k hash of A is in B, so true
    * subsets score 1.0 — unless a probe hash hits a boilerplate gram the
    * `maxGramDf` cap removed from the index side, in which case the
    * score drops below 1.0 (the exact variant suppresses the same grams
    * intentionally; the conditional is shared, not a sketch artifact).
    * Probe-side join cost
    * drops from O(grams/doc) to O(k) per doc; the estimate is an
    * integer/integer division, so the whole query hash-verifies with no
    * rounding. md5 bottom-k is the same engine-portable sketch as
    * [[TextOps.docFingerprint]]. */
  def containmentSketch(spark: SparkSession, dir: String, n: Int = 8,
                        k: Int = 16, thresh: Double = 0.8,
                        maxGramDf: Int = 50): DataFrame = {
    val d = documents(spark, dir).select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= n)
    // per-doc DISTINCT md5 gram hashes; feeds the sketch, the index, and
    // the per-doc size — persist, consume, unpersist (result eagerly
    // checkpointed)
    val gs = d.select(col("doc_id"), array_distinct(
      transform(sequence(lit(0), size(col("t")) - n),
        i => md5(concat_ws(" ", slice(col("t"), i + 1, lit(n)))))).as("gs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val probe = gs.select(col("doc_id").as("a_id"),
        least(size(col("gs")), lit(k)).as("k_eff"),
        explode(slice(array_sort(col("gs")), 1, k)).as("g"))
      val index = gs.select(col("doc_id").as("b_id"), explode(col("gs")).as("g"))
      val live = index.join(
        index.groupBy("g").agg(count(lit(1)).as("gdf")).filter(col("gdf") <= maxGramDf)
          .select("g"),
        "g").select(col("g"), col("b_id"))
      probe.join(live, "g")
        .filter(col("a_id") =!= col("b_id"))
        .groupBy(col("a_id"), col("b_id"), col("k_eff"))
        .agg(count(lit(1)).as("k_hits"))
        .withColumn("containment_est",
          col("k_hits").cast(DoubleType) / col("k_eff"))
        .filter(col("containment_est") >= thresh)
        .select(col("a_id"), col("b_id"), col("k_hits"),
          col("k_eff").cast(IntegerType).as("k_eff"), col("containment_est"))
        .orderBy("a_id", "b_id")
        .localCheckpoint(true)
    } finally gs.unpersist()
  }

  private def containmentSketchOracle(n: Int = 8, k: Int = 16,
                                      thresh: Double = 0.8,
                                      maxGramDf: Int = 50): String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |            WHERE len(string_split(text, ' ')) >= $n),
       |gs AS (SELECT doc_id, list_distinct(list_transform(
       |         generate_series(1, len(t) - ${n - 1}),
       |         i -> md5(array_to_string(t[CAST(i AS INT):CAST(i + ${n - 1} AS INT)], ' ')))) AS gs
       |       FROM tk),
       |probe AS (SELECT doc_id AS a_id, least(len(gs), $k) AS k_eff, unnest(list_sort(gs)[1:$k]) AS g FROM gs),
       |idx AS (SELECT doc_id AS b_id, unnest(gs) AS g FROM gs),
       |live AS (SELECT idx.* FROM idx JOIN (
       |    SELECT g FROM idx GROUP BY g HAVING count(*) <= $maxGramDf) f USING (g)),
       |hits AS (SELECT a_id, b_id, k_eff, count(*) AS k_hits
       |         FROM probe JOIN live USING (g) WHERE a_id <> b_id
       |         GROUP BY a_id, b_id, k_eff)
       |SELECT a_id, b_id, CAST(k_hits AS BIGINT) AS k_hits,
       |       CAST(k_eff AS INT) AS k_eff,
       |       CAST(k_hits AS DOUBLE) / k_eff AS containment_est
       |FROM hits WHERE CAST(k_hits AS DOUBLE) / k_eff >= $thresh
       |ORDER BY a_id, b_id""".stripMargin

  // ---- linear quality classifier -------------------------------------

  /** Published-weight linear quality classifier — the fastText-style
    * scoring pass (CCNet / LLaMA corpus curation) that follows the
    * heuristic rules: score = sigmoid(w · features) over the same
    * document features as the Gopher/C4 rules, with the weight vector a
    * literal on both sides (a trained model ships its weights exactly
    * like this). Pure map stage — per-row HOF feature math, no shuffle
    * at any scale. The keep verdict tests the LINEAR margin (z ≥ 0),
    * not the rounded sigmoid, so the cutoff is exact; only the reported
    * probability is rounded (sigmoid's `exp` may differ in the last ulp
    * between engines). */
  /** The classifier's linear margin z = w · (features − centers) — one
    * expression shared by the scoring query and the AUC evaluation so
    * the two can never drift. */
  private def classifierMargin: Column = {
    val nTok = size(toks).cast(DoubleType)
    val meanTokLen = DocFeatures.meanTokLen(toks)
    // hash-only symbol ratio — a DELIBERATE difference from gopherRules'
    // hash+ellipsis ratio: the published weights below were fit to this
    // feature (see DocFeatures' scaladoc)
    val nHash = length(col("text")) - length(regexp_replace(col("text"), "#", ""))
    val symbolRatio = nHash.cast(DoubleType) / nTok
    val alphaFrac = DocFeatures.alphaFrac(toks)
    val numericFrac = DocFeatures.numericFrac(toks)
    val stopCount = DocFeatures.stopCount(toks).cast(DoubleType)
    lit(0.05) * (nTok - 54.0) +
      lit(0.2) * (meanTokLen - 4.5) +
      lit(2.0) * (alphaFrac - 0.9) -
      lit(10.0) * symbolRatio -
      lit(5.0) * numericFrac +
      lit(0.3) * (stopCount - 5.0)
  }

  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val z = classifierMargin
    documents(spark, dir)
      .select(col("doc_id"), round(z, 4).as("margin"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 4).as("score"),
        (z >= 0).as("keep"))
      .orderBy("doc_id")
  }

  private def qualityClassifierOracle: String =
    """WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
      |f AS (SELECT doc_id,
      |  CAST(len(w) AS DOUBLE) AS n_tok,
      |  CAST(list_sum(list_transform(w, t -> len(t))) AS DOUBLE) / len(w) AS mean_tok_len,
      |  CAST(len(text) - len(replace(text, '#', '')) AS DOUBLE) / len(w) AS symbol_ratio,
      |  CAST(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(w) AS alpha_frac,
      |  CAST(len(list_filter(w, t -> regexp_matches(t, '^[0-9]+$'))) AS DOUBLE) / len(w) AS numeric_frac,
      |  CAST(len(list_filter(w, t -> t IN ('the','be','to','of','and','that','have','with'))) AS DOUBLE) AS stop_count
      |FROM d),
      |z AS (SELECT doc_id,
      |  0.05 * (n_tok - 54.0) + 0.2 * (mean_tok_len - 4.5) + 2.0 * (alpha_frac - 0.9)
      |  - 10.0 * symbol_ratio - 5.0 * numeric_frac + 0.3 * (stop_count - 5.0) AS z
      |FROM f)
      |SELECT doc_id, ROUND(z, 4) AS margin,
      |       ROUND(1.0 / (1.0 + exp(-z)), 4) AS score, (z >= 0) AS keep
      |FROM z ORDER BY doc_id""".stripMargin

  // ---- classifier evaluation: ROC-AUC --------------------------------

  /** ROC-AUC of the quality classifier per language (+ pooled 'all') —
    * the evaluation step that belongs next to every trained filter: did
    * the scorer actually rank good docs above bad ones, per slice? The
    * proxy label is `n_chars >= cut` (longer docs as "good"), a
    * deterministic stand-in for human labels with the same mechanics.
    *
    * AUC via the Mann–Whitney rank identity with exact tie handling:
    * over ranks ASC by score, a tie group's average rank is
    * (2·rank + ties − 1)/2, so DOUBLED average ranks stay integers —
    * summed as BIGINTs, the whole statistic is integer-exact until the
    * one final division, and hash-verifies with no float tolerance.
    * AUC = (Σ_pos 2·avg_rank − n_pos(n_pos+1)) / (2·n_pos·n_neg).
    *
    * Scale shape: scoring is the classifier's map stage; ranking is one
    * window per (lang) slice — slices shard the sort; the pooled row
    * costs one more pass. The ranking key is the margin ROUNDED to 6
    * (ulp-safe across engines), ties resolved by the average-rank
    * formula rather than an arbitrary tiebreak. */
  def classifierAuc(spark: SparkSession, dir: String,
                    cut: Int = 256): DataFrame = {
    val scored = documents(spark, dir)
      .select(col("lang"), round(classifierMargin, 6).as("s"),
        (col("n_chars") >= cut).as("pos"))
      .withColumn("pooled", lit(false))
    // The pooled slice is keyed by an explicit boolean flag (lang
    // NULLed), never by a sentinel lang value — a corpus whose real
    // lang column literally contains 'all' must not silently merge
    // into the pooled row. The display name 'all' is projected only
    // at the very end, after grouping.
    val pooled = scored
      .withColumn("pooled", lit(true))
      .withColumn("lang", lit(null).cast("string"))
    val u = scored.unionByName(pooled)
    val wRank = Window.partitionBy(col("pooled"), col("lang"))
      .orderBy(col("s"))
    val wTie = Window.partitionBy(col("pooled"), col("lang"), col("s"))
    val ranked = u
      .withColumn("ar2", // doubled average rank: 2·rank + ties − 1 (integer)
        lit(2) * rank().over(wRank) + count(lit(1)).over(wTie) - 1)
    ranked.groupBy(col("pooled"), col("lang"))
      .agg(
        sum(when(col("pos"), col("ar2")).otherwise(lit(0L))).as("sum_pos_2r"),
        count(when(col("pos"), lit(1))).as("n_pos"),
        count(when(!col("pos"), lit(1))).as("n_neg"))
      .select(
        when(col("pooled"), lit("all")).otherwise(col("lang")).as("lang"),
        col("n_pos"), col("n_neg"),
        // single-class slice (all-pos or all-neg): AUC is undefined —
        // NULL, never a NaN/Inf whose cross-engine encoding differs
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("sum_pos_2r") - col("n_pos") * (col("n_pos") + 1))
            .cast(DoubleType) / (lit(2.0) * col("n_pos") * col("n_neg")), 6))
          .as("auc"))
      .orderBy("lang")
  }

  private def classifierAucOracle(cut: Int = 256): String =
    """WITH d AS (SELECT doc_id, lang, n_chars, text, string_split(text, ' ') AS w FROM documents),
      |f AS (SELECT doc_id, lang, n_chars,
      |  CAST(len(w) AS DOUBLE) AS n_tok,
      |  CAST(list_sum(list_transform(w, t -> len(t))) AS DOUBLE) / len(w) AS mean_tok_len,
      |  CAST(len(text) - len(replace(text, '#', '')) AS DOUBLE) / len(w) AS symbol_ratio,
      |  CAST(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(w) AS alpha_frac,
      |  CAST(len(list_filter(w, t -> regexp_matches(t, '^[0-9]+$'))) AS DOUBLE) / len(w) AS numeric_frac,
      |  CAST(len(list_filter(w, t -> t IN ('the','be','to','of','and','that','have','with'))) AS DOUBLE) AS stop_count
      |FROM d),
      |z AS (SELECT lang, ROUND(
      |    0.05 * (n_tok - 54.0) + 0.2 * (mean_tok_len - 4.5) + 2.0 * (alpha_frac - 0.9)
      |    - 10.0 * symbol_ratio - 5.0 * numeric_frac + 0.3 * (stop_count - 5.0), 6) AS s,
      |  (n_chars >= CUT) AS pos FROM f),
      |u AS (SELECT FALSE AS pooled, lang, s, pos FROM z
      |      UNION ALL SELECT TRUE, CAST(NULL AS VARCHAR), s, pos FROM z),
      |r AS (SELECT pooled, lang, pos,
      |  2 * rank() OVER (PARTITION BY pooled, lang ORDER BY s)
      |    + count(*) OVER (PARTITION BY pooled, lang, s) - 1 AS ar2 FROM u)
      |SELECT CASE WHEN pooled THEN 'all' ELSE lang END AS lang,
      |  CAST(count(*) FILTER (WHERE pos) AS BIGINT) AS n_pos,
      |  CAST(count(*) FILTER (WHERE NOT pos) AS BIGINT) AS n_neg,
      |  CASE WHEN count(*) FILTER (WHERE pos) > 0 AND count(*) FILTER (WHERE NOT pos) > 0 THEN
      |  ROUND(CAST(CAST(SUM(CASE WHEN pos THEN ar2 ELSE 0 END) AS BIGINT)
      |        - count(*) FILTER (WHERE pos) * (count(*) FILTER (WHERE pos) + 1) AS DOUBLE)
      |    / (2.0 * count(*) FILTER (WHERE pos) * count(*) FILTER (WHERE NOT pos)), 6)
      |  END AS auc
      |FROM r GROUP BY pooled, lang ORDER BY 1""".stripMargin
      .replace("CUT", cut.toString)

  // ---- classifier evaluation: calibration (reliability diagram) ------

  /** Calibration of the quality classifier — the reliability-diagram /
    * expected-calibration-error pass that belongs next to ROC-AUC: a
    * filter whose scores rank well (high AUC) can still be badly
    * calibrated ("0.9" docs that are good only 60% of the time), which
    * matters whenever the score is used as a THRESHOLD or a sampling
    * weight rather than a ranking. Scores bin into `bins` equal-width
    * probability buckets; per bucket: count, mean confidence, empirical
    * accuracy against the same proxy label as [[classifierAuc]], the
    * |acc − conf| gap, and the ECE contribution (n/N)·gap — summing
    * `wgap` over the rows IS the expected calibration error.
    *
    * Scale shape: scoring is the classifier's map stage; the binning is
    * one `bins`-row partial-combine aggregate plus a one-row total
    * broadcast — no sort, no window, O(bins) output at any corpus size.
    * Determinism: the margin is IEEE-exact, so only sigmoid's `exp` is
    * libm — the score is rounded to 6 BEFORE binning and averaging
    * (identical doubles cross-engine), bin sums quantize the rounded
    * score to DECIMAL(30,15) (order-independent), and gap/wgap derive
    * from the already-rounded conf/acc so every reported digit is
    * reproducible. */
  def classifierCalibration(spark: SparkSession, dir: String,
                            cut: Int = 256, bins: Int = 10): DataFrame = {
    val z = classifierMargin
    val d = documents(spark, dir)
      .select(round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("s"),
        (col("n_chars") >= cut).cast(IntegerType).as("pos"))
      .withColumn("bin",
        least(floor(col("s") * bins), lit(bins - 1)).cast(IntegerType))
    val tot = d.agg(count(lit(1)).as("n_total"))
    val conf = round(col("sum_s").cast(DoubleType) / col("n"), 6)
    val acc = round(col("n_pos").cast(DoubleType) / col("n"), 6)
    d.groupBy(col("bin")).agg(
        count(lit(1)).as("n"),
        sum(col("s").cast(DecimalType(30, 15))).as("sum_s"),
        sum(col("pos")).cast(LongType).as("n_pos"))
      .crossJoin(broadcast(tot))
      .select(col("bin"), col("n"),
        conf.as("conf"), acc.as("acc"),
        round(abs(acc - conf), 6).as("gap"),
        round(col("n").cast(DoubleType) / col("n_total")
          * round(abs(acc - conf), 6), 6).as("wgap"))
      .orderBy("bin")
  }

  private def classifierCalibrationOracle(cut: Int = 256, bins: Int = 10): String =
    s"""WITH d AS (SELECT doc_id, n_chars, text, string_split(text, ' ') AS w FROM documents),
       |f AS (SELECT doc_id, n_chars,
       |  CAST(len(w) AS DOUBLE) AS n_tok,
       |  CAST(list_sum(list_transform(w, t -> len(t))) AS DOUBLE) / len(w) AS mean_tok_len,
       |  CAST(len(text) - len(replace(text, '#', '')) AS DOUBLE) / len(w) AS symbol_ratio,
       |  CAST(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(w) AS alpha_frac,
       |  CAST(len(list_filter(w, t -> regexp_matches(t, '^[0-9]+$$'))) AS DOUBLE) / len(w) AS numeric_frac,
       |  CAST(len(list_filter(w, t -> t IN ('the','be','to','of','and','that','have','with'))) AS DOUBLE) AS stop_count
       |FROM d),
       |z AS (SELECT n_chars,
       |  0.05 * (n_tok - 54.0) + 0.2 * (mean_tok_len - 4.5) + 2.0 * (alpha_frac - 0.9)
       |  - 10.0 * symbol_ratio - 5.0 * numeric_frac + 0.3 * (stop_count - 5.0) AS z
       |FROM f),
       |s AS (SELECT ROUND(1.0 / (1.0 + exp(-z)), 6) AS s,
       |        CASE WHEN n_chars >= $cut THEN 1 ELSE 0 END AS pos FROM z),
       |b AS (SELECT least(CAST(floor(s * $bins) AS INT), ${bins - 1}) AS bin, s, pos FROM s),
       |g AS (SELECT bin, count(*) AS n, sum(CAST(s AS DECIMAL(30,15))) AS sum_s,
       |        sum(pos) AS n_pos FROM b GROUP BY bin),
       |t AS (SELECT sum(n) AS n_total FROM g),
       |r AS (SELECT bin, CAST(n AS BIGINT) AS n,
       |        ROUND(CAST(sum_s AS DOUBLE) / n, 6) AS conf,
       |        ROUND(CAST(n_pos AS DOUBLE) / n, 6) AS acc, n_total
       |      FROM g, t)
       |SELECT bin, n, conf, acc,
       |  ROUND(abs(acc - conf), 6) AS gap,
       |  ROUND(CAST(n AS DOUBLE) / n_total * ROUND(abs(acc - conf), 6), 6) AS wgap
       |FROM r ORDER BY bin""".stripMargin

  // ---- classifier training: full-batch GD trace -----------------------

  /** Number of trainer features (bias + six margin features). */
  private val trainDim = 7

  /** Trainer learning rate — exactly representable in binary so the
    * weight updates stay IEEE-exact on both engines. */
  private val trainLr = 0.5

  /** The centered, 6-dp-quantized feature columns the trainer fits:
    * bias first, then the six [[classifierMargin]] features rescaled to
    * comparable ranges so one learning rate serves every coordinate.
    * Quantizing each feature to 6 dp up front makes the feature matrix
    * bit-identical across engines (the raw features are single
    * divisions of integer counts — identical doubles — so the rounding
    * agrees), and everything downstream is exact arithmetic. */
  private def trainFeatures: Seq[Column] = {
    val nTok = size(toks).cast(DoubleType)
    val nHash = length(col("text")) - length(regexp_replace(col("text"), "#", ""))
    Seq(
      lit(1.0),
      round((nTok - 54.0) / 100.0, 6),
      round(DocFeatures.meanTokLen(toks) - 4.5, 6),
      round(DocFeatures.alphaFrac(toks) - 0.9, 6),
      round(nHash.cast(DoubleType) / nTok, 6),
      round(DocFeatures.numericFrac(toks), 6),
      round((DocFeatures.stopCount(toks).cast(DoubleType) - 5.0) / 10.0, 6))
  }

  /** Logistic-regression TRAINING of the quality classifier as a fixed
    * two-iteration full-batch gradient-ascent trace — the step that
    * closes the classifier lifecycle in-engine: TRAIN (this) → score
    * ([[qualityClassifier]]) → rank-evaluate ([[classifierAuc]]) →
    * calibrate ([[classifierCalibration]]). Labels are the same
    * `n_chars >= cut` proxy the evaluators use, so the whole chain fits
    * and grades one model family end-to-end.
    *
    * Update rule: w ← w + lr · (1/n) Σᵢ (yᵢ − σ̂(w·xᵢ)) xᵢ, from w = 0.
    * The activation is the Elliott rational sigmoid
    * σ̂(z) = ½(1 + z/(1+|z|)) (Elliott 1993, the standard
    * hardware/quantized-training substitute) — division, addition and
    * |·| only, so unlike exp it is bit-identical across engines and the
    * whole trace needs NO float tolerance: per-row arithmetic is exact
    * IEEE on identical operands, and the only reductions are the
    * per-coordinate gradient sums, DECIMAL(30,15)-quantized
    * (HACKING rule 1 — partition-order-independent). The margin z folds
    * left-to-right (w₀x₀ + w₁x₁ + …), the same association the oracle
    * spells out. Between iterations the 7 weights collect to the driver
    * (metadata-scale, the same contract as kmeansTrace) and fold into
    * the next pass as literals.
    *
    * Scale shape: one partial-combine aggregation job per iteration over
    * a map-only feature stage — 7 DECIMAL sums wide, one output row; no
    * shuffle of doc-level data, no driver loop over rows. At 100 TB each
    * iteration is a single scan+reduce; iteration count is a constant.
    * Output: per-iteration per-coordinate gradient and updated weight
    * (both exact; rounded to 9 dp for display). */
  def classifierTrain(spark: SparkSession, dir: String,
                      cut: Int = 256, iters: Int = 2): DataFrame = {
    import spark.implicits._
    val base = documents(spark, dir)
      .select(trainFeatures.zipWithIndex.map { case (f, i) => f.as(s"x$i") } :+
        when(col("n_chars") >= cut, lit(1.0)).otherwise(lit(0.0)).as("y"): _*)
      .localCheckpoint(true)
    try {
      var w = Array.fill(trainDim)(0.0)
      val trace = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double, Double)]
      for (iter <- 1 to iters) {
        val z = (0 until trainDim).map(d => lit(w(d)) * col(s"x$d"))
          .reduceLeft(_ + _) // left-assoc fold, mirrored in the oracle
        val sig = lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))
        val resid = col("y") - sig
        val aggs = (0 until trainDim).map(d =>
          (sum((resid * col(s"x$d")).cast(DecimalType(30, 15)))
            .cast(DoubleType) / count(lit(1))).as(s"g$d"))
        val g = base.agg(aggs.head, aggs.tail: _*).collect()(0)
        (0 until trainDim).foreach { d =>
          val gd = g.getDouble(d)
          w = w.updated(d, w(d) + trainLr * gd)
          trace += ((iter, d, gd, w(d)))
        }
      }
      trace.toSeq.toDF("iter", "d", "grad", "weight")
        .select(col("iter"), col("d"), round(col("grad"), 9).as("grad"),
          round(col("weight"), 9).as("weight"))
        .orderBy("iter", "d")
    } finally org.apache.spark.sql.GraftShim.dropCheckpointBlocks(base)
  }

  /** DuckDB mirror of [[classifierTrain]] — the same two gradient-ascent
    * iterations replayed in SQL: 6-dp feature quantization, iter-1
    * residual y − ½ exactly (w = 0 ⇒ z = 0), DECIMAL(30,15) gradient
    * sums, Elliott sigmoid on the left-assoc margin for iter 2. */
  private def classifierTrainOracle(cut: Int = 256): String = {
    val featSql = Seq(
      "1.0",
      "ROUND((CAST(len(w) AS DOUBLE) - 54.0) / 100.0, 6)",
      "ROUND(CAST(list_sum(list_transform(w, t -> len(t))) AS DOUBLE) / len(w) - 4.5, 6)",
      "ROUND(CAST(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(w) - 0.9, 6)",
      "ROUND(CAST(len(text) - len(replace(text, '#', '')) AS DOUBLE) / len(w), 6)",
      "ROUND(CAST(len(list_filter(w, t -> regexp_matches(t, '^[0-9]+$'))) AS DOUBLE) / len(w), 6)",
      "ROUND((CAST(len(list_filter(w, t -> t IN ('the','be','to','of','and','that','have','with'))) AS DOUBLE) - 5.0) / 10.0, 6)")
    val ds = 0 until trainDim
    val feats = ds.map(d => s"${featSql(d)} AS x$d").mkString(",\n|  ")
    def gradSelect(resid: String) = ds.map(d =>
      s"CAST(SUM(CAST(($resid) * x$d AS DECIMAL(30,15))) AS DOUBLE) / COUNT(*) AS g$d")
      .mkString(",\n|        ")
    val w1Cols = ds.map(d => s"$trainLr * g$d AS a$d").mkString(", ")
    val zExpr = ds.map(d => s"w1.a$d * f.x$d").mkString(" + ")
    val w2Cols = ds.map(d => s"w1.a$d + $trainLr * g2.g$d AS b$d").mkString(", ")
    val out = ds.map(d =>
      s"SELECT 1 AS iter, $d AS d, ROUND(g1.g$d, 9) AS grad, ROUND(w1.a$d, 9) AS weight FROM g1, w1").mkString(" UNION ALL\n|") +
      " UNION ALL\n|" + ds.map(d =>
      s"SELECT 2 AS iter, $d AS d, ROUND(g2.g$d, 9) AS grad, ROUND(w2.b$d, 9) AS weight FROM g2, w2").mkString(" UNION ALL\n|")
    s"""WITH docs AS (SELECT n_chars, text, string_split(text, ' ') AS w FROM documents),
       |f AS (SELECT
       |  $feats,
       |  CASE WHEN n_chars >= $cut THEN 1.0 ELSE 0.0 END AS y
       |FROM docs),
       |g1 AS (SELECT ${gradSelect("y - 0.5")}
       |       FROM f),
       |w1 AS (SELECT $w1Cols FROM g1),
       |r2 AS (SELECT f.*, f.y - 0.5 * (1.0 + z / (1.0 + abs(z))) AS resid FROM (
       |         SELECT f.*, $zExpr AS z FROM f CROSS JOIN w1) f),
       |g2 AS (SELECT ${gradSelect("resid")}
       |       FROM r2),
       |w2 AS (SELECT $w2Cols FROM w1 CROSS JOIN g2)
       |$out
       |ORDER BY iter, d""".stripMargin
  }

  // ---- hybrid retrieval fusion (RRF) ---------------------------------

  /** Reciprocal-rank fusion (Cormack et al.) of two retrievers over the
    * embeddings corpus — the standard late-fusion step of hybrid
    * (sparse + dense) retrieval in RAG pipelines: each retriever
    * contributes 1/(C + rank) for candidates inside its top-`k` list,
    * and candidates re-rank by the summed score. The two retrievers
    * here are cosine (normalized semantic match) and raw inner product
    * (magnitude-sensitive match) — genuinely different rankings from
    * one scored pass.
    *
    * Determinism: both retriever scores are sequential-fold dot
    * products (bit-identical to DuckDB), so the per-retriever integer
    * ranks agree exactly; the RRF score is one or two exact divisions
    * plus one addition — no rounding needed anywhere. Scale shape: one
    * broadcast-query scored pass feeds BOTH rank windows (no second
    * corpus scan); at production Q·N each retriever would contribute
    * its own top-k candidate list (ANN/BM25) and fusion joins k-sized
    * lists per query — the fusion stage itself never touches the
    * corpus. */
  def rrfFusion(spark: SparkSession, dir: String,
                numQueries: Int = 8, k: Int = 20, fuseK: Int = 10,
                c: Int = 60): DataFrame = {
    import graft.functions.GraftFunctions.vec_dot
    graft.functions.GraftFunctions.register(spark)
    // one cosine implementation in the codebase: Similarity.cosine is
    // the fold shape every oracle mirrors — an inline copy here could
    // silently drift from the DuckDB side under a future edit
    val e = embeddings(spark, dir).select(col("vec_id"),
      transform(col("embedding"), x => x.cast(DoubleType)).as("e"))
    val q = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        vec_dot(col("qe"), col("e")).as("dot"),
        Similarity.cosine(col("qe"), col("e")).as("cos"))
    val wCos = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    val wDot = Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("neighbor_id"))
    val ranked = scored
      .withColumn("r_cos", row_number().over(wCos))
      .withColumn("r_dot", row_number().over(wDot))
      .withColumn("rrf",
        when(col("r_cos") <= k, lit(1.0) / (lit(c) + col("r_cos"))).otherwise(lit(0.0)) +
          when(col("r_dot") <= k, lit(1.0) / (lit(c) + col("r_dot"))).otherwise(lit(0.0)))
      .filter(col("rrf") > 0)
    val wF = Window.partitionBy(col("query_id")).orderBy(col("rrf").desc, col("neighbor_id"))
    ranked.withColumn("rank", row_number().over(wF))
      .filter(col("rank") <= fuseK)
      .select(col("query_id"), col("neighbor_id"), col("r_cos"), col("r_dot"),
        col("rrf"), col("rank"))
      .orderBy("query_id", "rank")
  }

  private def rrfOracle(numQueries: Int = 8, k: Int = 20, fuseK: Int = 10,
                        c: Int = 60): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |q AS (SELECT vec_id AS query_id, e AS qe FROM e WHERE vec_id < $numQueries),
       |sc AS (SELECT q.query_id, e.vec_id AS neighbor_id,
       |         list_dot_product(q.qe, e.e) AS dot,
       |         list_dot_product(q.qe, e.e)
       |           / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(e.e, e.e))) AS cos
       |       FROM q, e WHERE e.vec_id <> q.query_id),
       |r AS (SELECT query_id, neighbor_id,
       |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS r_cos,
       |        row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS r_dot
       |      FROM sc),
       |f AS (SELECT query_id, neighbor_id, r_cos, r_dot,
       |        (CASE WHEN r_cos <= $k THEN 1.0 / ($c + r_cos) ELSE 0.0 END
       |         + CASE WHEN r_dot <= $k THEN 1.0 / ($c + r_dot) ELSE 0.0 END) AS rrf
       |      FROM r)
       |SELECT query_id, neighbor_id, CAST(r_cos AS INT) AS r_cos,
       |       CAST(r_dot AS INT) AS r_dot, rrf, CAST(rn AS INT) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS rn
       |  FROM f WHERE rrf > 0)
       |WHERE rn <= $fuseK ORDER BY query_id, rank""".stripMargin

  // ---- retrieval evaluation (P@k / R@k / MRR / nDCG@k) ---------------

  /** The DCG position gains 1/log2(i+1) for i = 1..k and their prefix
    * sums (the ideal DCG for j relevant items), computed ONCE driver-side
    * and embedded as identical literals in both the DataFrame plan and
    * the DuckDB oracle (the `lshPlanes` published-constants pattern) —
    * the eval metrics then involve zero cross-engine libm calls. */
  private def dcgGains(k: Int): (Seq[Double], Seq[Double]) = {
    val g = (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    (g, g.scanLeft(0.0)(_ + _).tail)
  }

  /** Offline retrieval-quality evaluation — the metric pass every
    * retrieval/RAG pipeline runs after building an index: for each query
    * vector, rank the corpus by cosine, mark a neighbor relevant when it
    * shares the query's class `label`, and report Precision@k, Recall@k,
    * MRR, and nDCG@k per query.
    *
    * Scale shape: ONE broadcast-query scored pass feeds rank + all four
    * metrics (at production scale the ranked list comes from the ANN
    * index's top-k candidates instead of a corpus scan — the metric
    * aggregation itself is one query-keyed combine over k rows/query).
    * Determinism: cosine is the bit-exact sequential fold, so ranks
    * agree across engines exactly; hit counts and first-relevant ranks
    * are integers; DCG terms are the k published gain literals quantized
    * to DECIMAL(30,15) (exact, order-independent sum); IDCG is a literal
    * prefix-sum lookup. Every division is IEEE-exact on identical
    * operands, rounded to 6 only for display. */
  def retrievalEval(spark: SparkSession, dir: String,
                    numQueries: Int = 8, k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val (gains, idcgs) = dcgGains(k)
    val gainArr = array(gains.map(lit): _*)
    val idcgArr = array(idcgs.map(lit): _*)
    val e = embeddings(spark, dir).select(col("vec_id"),
      transform(col("embedding"), x => x.cast(DoubleType)).as("e"), col("label"))
    val q = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("label").as("qlabel"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Similarity.cosine(col("qe"), col("e")).as("sim"),
        (col("label") === col("qlabel")).cast(IntegerType).as("rel"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    val ranked = scored.withColumn("rank", row_number().over(w))
    val zeroD = lit(0).cast(DecimalType(30, 15))
    val perQ = ranked.groupBy(col("query_id")).agg(
      sum(col("rel")).cast(LongType).as("n_rel"),
      sum(when(col("rank") <= k, col("rel")).otherwise(0)).cast(LongType).as("hits"),
      min(when(col("rel") === 1, col("rank"))).as("frr"),
      sum(when(col("rank") <= k && col("rel") === 1,
        element_at(gainArr, col("rank")).cast(DecimalType(30, 15)))
        .otherwise(zeroD)).as("dcg_d"))
    perQ.select(col("query_id"), col("n_rel"), col("hits"),
        round(col("hits").cast(DoubleType) / k, 6).as("p_at_k"),
        when(col("n_rel") > 0,
          round(col("hits").cast(DoubleType) / col("n_rel"), 6)).as("r_at_k"),
        when(col("frr").isNotNull,
          round(lit(1.0) / col("frr"), 6)).as("mrr"),
        when(col("n_rel") > 0,
          round(col("dcg_d").cast(DoubleType)
            / element_at(idcgArr, least(lit(k), col("n_rel")).cast(IntegerType)), 6))
          .as("ndcg"))
      .orderBy("query_id")
  }

  private def retrievalEvalOracle(numQueries: Int = 8, k: Int = 10): String = {
    val (gains, idcgs) = dcgGains(k)
    val gLit = gains.map(java.lang.Double.toString).mkString("[", ", ", "]")
    val iLit = idcgs.map(java.lang.Double.toString).mkString("[", ", ", "]")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings),
       |q AS (SELECT vec_id AS query_id, e AS qe, label AS qlabel FROM e
       |      WHERE vec_id < $numQueries),
       |sc AS (SELECT q.query_id, e.vec_id AS neighbor_id,
       |         list_dot_product(q.qe, e.e)
       |           / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(e.e, e.e))) AS sim,
       |         CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS rel
       |       FROM q, e WHERE e.vec_id <> q.query_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim DESC, neighbor_id) AS rank FROM sc),
       |g AS (SELECT query_id,
       |        CAST(sum(rel) AS BIGINT) AS n_rel,
       |        CAST(sum(CASE WHEN rank <= $k THEN rel ELSE 0 END) AS BIGINT) AS hits,
       |        min(CASE WHEN rel = 1 THEN rank END) AS frr,
       |        sum(CASE WHEN rank <= $k AND rel = 1
       |              THEN CAST(list_extract($gLit, rank) AS DECIMAL(30,15))
       |              ELSE CAST(0 AS DECIMAL(30,15)) END) AS dcg_d
       |      FROM r GROUP BY query_id)
       |SELECT query_id, n_rel, hits,
       |  ROUND(CAST(hits AS DOUBLE) / $k, 6) AS p_at_k,
       |  CASE WHEN n_rel > 0 THEN ROUND(CAST(hits AS DOUBLE) / n_rel, 6) END AS r_at_k,
       |  CASE WHEN frr IS NOT NULL THEN ROUND(1.0 / frr, 6) END AS mrr,
       |  CASE WHEN n_rel > 0 THEN ROUND(CAST(dcg_d AS DOUBLE)
       |    / list_extract($iLit, least($k, n_rel)), 6) END AS ndcg
       |FROM g ORDER BY query_id""".stripMargin
  }

  // ---- MMR diverse selection -----------------------------------------

  /** Maximal Marginal Relevance (Carbonell & Goldstein 1998) — the
    * classic relevance-vs-redundancy re-ranker used to pick a DIVERSE
    * top-`sel` from a retrieval candidate pool (RAG context selection,
    * diverse few-shot example picking, dataset diversification). Per
    * query: seed with the most relevant candidate, then repeatedly take
    *
    *   argmax_c [ λ·rel(c) − (1−λ)·max_{s ∈ selected} sim(c, s) ]
    *
    * over the unselected pool.
    *
    * Scale shape: the candidate pool is the per-query top-`poolK` from
    * one broadcast-query scored pass (at production it's the ANN
    * candidate list) and the pairwise similarities are a bounded
    * pool-self equi-join — both distributed, the corpus scanned exactly
    * once. The greedy argmax itself runs DRIVER-SIDE over the collected
    * Q·poolK candidate rows: MMR is inherently sequential (`sel` data-
    * dependent rounds), the candidate list is metadata-scale by
    * construction (bounded by the literal query batch, NOT by corpus
    * size — the same bounded-collect class as the BPE argmax and the
    * k·dim centroid aggregates), and replacing `sel` rounds of tiny
    * shuffles with one in-memory loop is strictly less cluster work.
    * Determinism: rel and sim are bit-exact sequential-fold cosines
    * computed distributed; the driver's λ·rel − (1−λ)·msim uses the
    * identical IEEE doubles, so the greedy sequence is bit-identical to
    * the oracle's unrolled-CTE replay (the `bpe_merges` pattern). */
  def mmrSelect(spark: SparkSession, dir: String, numQueries: Int = 4,
                poolK: Int = 20, sel: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val (lam, oneMinusLam) = (0.7, 0.3)
    val e = embeddings(spark, dir).select(col("vec_id"),
      transform(col("embedding"), x => x.cast(DoubleType)).as("e"))
    val q = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"))
    val scoredAll = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        Similarity.cosine(col("qe"), col("e")).as("rel"), col("e"))
    val wPool = Window.partitionBy(col("query_id")).orderBy(col("rel").desc, col("cand_id"))
    val pool = scoredAll.withColumn("rn", row_number().over(wPool))
      .filter(col("rn") <= poolK).drop("rn")
      .localCheckpoint()
    val pe = pool.select(col("query_id"), col("cand_id"), col("e"))
    val simRows = pe.as("a").join(pe.as("b"), Seq("query_id"))
      .filter(col("a.cand_id") =!= col("b.cand_id"))
      .select(col("query_id"), col("a.cand_id").as("a"), col("b.cand_id").as("b"),
        Similarity.cosine(col("a.e"), col("b.e")).as("sim"))
      .collect() // Q·poolK·(poolK−1) rows — bounded by the query batch
    val sims = simRows.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val poolRows = pool.select(col("query_id"), col("cand_id"), col("rel"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val out = poolRows.map(_._1).distinct.sorted.flatMap { qid =>
      val cands = poolRows.filter(_._1 == qid)
        .map { case (_, id, rel) => (id, rel) }
      val seed = cands.minBy { case (id, rel) => (-rel, id) }
      var selected = Vector((seed._1, 1, seed._2, Option.empty[Double]))
      for (step <- 2 to sel) {
        val chosen = selected.map(_._1).toSet
        val pick = cands.filterNot { case (id, _) => chosen(id) }
          .map { case (id, rel) =>
            val msim = selected.map(s => sims((qid, id, s._1))).max
            (id, rel, lam * rel - oneMinusLam * msim)
          }.minBy { case (id, _, m) => (-m, id) }
        selected :+= ((pick._1, step, pick._2, Some(pick._3)))
      }
      selected.map { case (id, step, rel, mmr) => (qid, step, id, rel, mmr) }
    }
    import spark.implicits._
    out.toSeq.toDF("query_id", "step", "cand_id", "rel_raw", "mmr_raw")
      .select(col("query_id"), col("step"), col("cand_id"),
        round(col("rel_raw"), 6).as("rel"), round(col("mmr_raw"), 6).as("mmr"))
      .orderBy("query_id", "step")
  }

  private def mmrOracle(numQueries: Int = 4, poolK: Int = 20, sel: Int = 5): String = {
    val steps = (2 to sel).map { i =>
      val prev = s"sel${i - 1}"
      s"""cand$i AS (SELECT p.* FROM pool p WHERE NOT EXISTS (
         |  SELECT 1 FROM $prev s WHERE s.query_id = p.query_id AND s.cand_id = p.cand_id)),
         |ms$i AS (SELECT si.query_id, si.a AS cand_id, max(si.sim) AS msim
         |         FROM sims si JOIN $prev s
         |           ON s.query_id = si.query_id AND s.cand_id = si.b
         |         GROUP BY si.query_id, si.a),
         |sc$i AS (SELECT c.query_id, c.cand_id, c.rel, 0.7 * c.rel - 0.3 * m.msim AS mmr
         |         FROM cand$i c JOIN ms$i m
         |           ON m.query_id = c.query_id AND m.cand_id = c.cand_id),
         |pick$i AS (SELECT query_id, cand_id, $i AS step, rel, mmr FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY mmr DESC, cand_id) AS rn FROM sc$i) WHERE rn = 1),
         |sel$i AS (SELECT * FROM $prev UNION ALL SELECT * FROM pick$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |q AS (SELECT vec_id AS query_id, e AS qe FROM e WHERE vec_id < $numQueries),
       |sc AS (SELECT q.query_id, e.vec_id AS cand_id,
       |         list_dot_product(q.qe, e.e)
       |           / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(e.e, e.e))) AS rel
       |       FROM q, e WHERE e.vec_id <> q.query_id),
       |pool AS (SELECT query_id, cand_id, rel FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY rel DESC, cand_id) AS rn FROM sc) WHERE rn <= $poolK),
       |pe AS (SELECT p.query_id, p.cand_id, e.e FROM pool p
       |       JOIN e ON e.vec_id = p.cand_id),
       |sims AS (SELECT a.query_id, a.cand_id AS a, b.cand_id AS b,
       |           list_dot_product(a.e, b.e)
       |             / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS sim
       |         FROM pe a JOIN pe b
       |           ON a.query_id = b.query_id AND a.cand_id <> b.cand_id),
       |sel1 AS (SELECT query_id, cand_id, 1 AS step, rel, CAST(NULL AS DOUBLE) AS mmr
       |         FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |           ORDER BY rel DESC, cand_id) AS rn FROM pool) WHERE rn = 1),
       |$steps
       |SELECT query_id, CAST(step AS INT) AS step, cand_id,
       |       ROUND(rel, 6) AS rel, ROUND(mmr, 6) AS mmr
       |FROM sel$sel ORDER BY query_id, step""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bm25_topk" -> ((s: SparkSession, d: String) => bm25TopK(s, d)),
    "tfidf_keywords" -> ((s: SparkSession, d: String) => tfidfKeywords(s, d)),
    "containment_dedup" -> ((s: SparkSession, d: String) => containmentDedup(s, d)),
    "containment_sketch" -> ((s: SparkSession, d: String) => containmentSketch(s, d)),
    "quality_classifier" -> ((s: SparkSession, d: String) => qualityClassifier(s, d)),
    "classifier_auc" -> ((s: SparkSession, d: String) => classifierAuc(s, d)),
    "classifier_calibration" -> ((s: SparkSession, d: String) => classifierCalibration(s, d)),
    "classifier_train" -> ((s: SparkSession, d: String) => classifierTrain(s, d)),
    "rrf_fusion" -> ((s: SparkSession, d: String) => rrfFusion(s, d)),
    "retrieval_eval" -> ((s: SparkSession, d: String) => retrievalEval(s, d)),
    "mmr_select" -> ((s: SparkSession, d: String) => mmrSelect(s, d))
  )

  val oracles: Map[String, String] = Map(
    "bm25_topk" -> bm25Oracle(),
    "tfidf_keywords" -> tfidfOracle(),
    "containment_dedup" -> containmentOracle(),
    "containment_sketch" -> containmentSketchOracle(),
    "quality_classifier" -> qualityClassifierOracle,
    "classifier_auc" -> classifierAucOracle(),
    "classifier_calibration" -> classifierCalibrationOracle(),
    "classifier_train" -> classifierTrainOracle(),
    "rrf_fusion" -> rrfOracle(),
    "retrieval_eval" -> retrievalEvalOracle(),
    "mmr_select" -> mmrOracle()
  )
}
