package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Tables._

/** Corpus-preparation operators a large-scale training-data pipeline
  * runs between raw documents and tokenized training sequences:
  * segment-level (paragraph) dedup, PII redaction, and sequence packing.
  * All three are codegen'd built-ins end-to-end — no UDFs, no driver
  * loops; shuffles are keyed on scalar hashes or bounded partitions.
  *
  * The synthetic documents have no newlines, so "paragraphs" are fixed
  * 10-token segments — the mechanics (segment → hash → corpus-wide
  * frequency → drop → reassemble) are identical to line/paragraph dedup
  * over real text (the CCNet / RefinedWeb preprocessing step).
  */
object CorpusOps {

  private val toks = split(col("text"), " ")

  /** Segment-level boilerplate removal: chop each doc into 10-token
    * segments, count each segment's document frequency corpus-wide, drop
    * segments appearing in >= 3 distinct docs (boilerplate), reassemble
    * the survivors in order.
    *
    * Scale shape: segmentation is map-side HOF math; the only shuffles
    * are a groupBy on the segment text's hash (at 100 TB: group on
    * xxhash64(seg) — the 80-char segment never needs to be the shuffle
    * key) and the reassembly groupBy on doc_id. No self-joins, no
    * windows over the whole corpus. */
  def dedupSegments(spark: SparkSession, dir: String,
                    segTokens: Int = 10, maxDocFreq: Int = 3): DataFrame = {
    val d = documents(spark, dir).select(col("doc_id"), toks.as("tk"))
    val segs = d
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), ceil(size(col("tk")).cast(DoubleType) / segTokens).cast(IntegerType) - 1),
        i => concat_ws(" ", slice(col("tk"), i * segTokens + 1, lit(segTokens))))))
      .withColumnRenamed("pos", "seg_pos").withColumnRenamed("col", "seg")
    val freq = segs.groupBy(col("seg"))
      .agg(countDistinct(col("doc_id")).as("doc_freq"))
    val kept = segs.join(freq, "seg").filter(col("doc_freq") < maxDocFreq)
    // reassembly: sort_array over (pos, seg) structs keeps segment order
    // without a window; left join keeps docs whose every segment dropped
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("seg_pos"), col("seg")))),
          s => s.getField("seg")), " ").as("clean_text"))
    documents(spark, dir)
      .select(col("doc_id"),
        ceil(size(toks).cast(DoubleType) / segTokens).cast(LongType).as("n_segments"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_segments"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  // RE2-compatible (and java.util.regex-compatible) patterns so the
  // Spark result and the DuckDB oracle agree byte-for-byte: character
  // classes and bounded quantifiers only, no backreferences/lookaround
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\b555-[0-9]{4}\\b"

  /** PII redaction: scrub email addresses and phone numbers, reporting
    * per-doc match counts. The corpus is synthetic word soup, so PII is
    * first INJECTED deterministically (every 5th doc gains an email +
    * phone tail) — the redaction mechanics are what the operator is
    * about. Pure map-side codegen: regexp_extract_all + regexp_replace,
    * no shuffle at all (at 100 TB this runs at scan speed). */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val seeded = documents(spark, dir).withColumn("text",
      when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or 555-01"),
          lpad((col("doc_id") % 100).cast(StringType), 2, "0")))
        .otherwise(col("text")))
    seeded.select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(phoneRe), lit(0))).as("n_phones"),
        regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").as("redacted"))
      .orderBy("doc_id")
  }

  /** Sequence packing (concat-and-chunk): documents are concatenated per
    * language in doc_id order into one token stream, which is cut into
    * fixed `budget`-token training sequences; each doc reports its
    * stream offset and the first/last pack it lands in.
    *
    * Scale shape: ONE running-sum window partitioned by lang — the
    * packing unit. At 100 TB the partition key is the shard (lang ×
    * shard-id), keeping every window partition bounded; the arithmetic
    * is unchanged. This is the GPT-style pretraining packing (docs cross
    * pack boundaries); bin-packing without splits is a different op. */
  def packSequences(spark: SparkSession, dir: String,
                    budget: Int = 512): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    documents(spark, dir)
      .select(col("doc_id"), col("lang"), size(toks).cast(LongType).as("n_tok"))
      .withColumn("tok_start", sum(col("n_tok")).over(w) - col("n_tok"))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("tok_start"),
        floor(col("tok_start") / budget).as("pack_first"),
        floor((col("tok_start") + col("n_tok") - 1) / budget).as("pack_last"))
      .orderBy("doc_id")
  }

  /** Corpus-wide token vocabulary, top-k by frequency (the counting pass
    * of tokenizer training / vocab pruning): one explode, one hash
    * aggregation with map-side partial combine, one k-row top-k — every
    * stage shuffles scalar (token, count) pairs only. Ties break on the
    * token itself so the result is deterministic at any parallelism. */
  def vocabTopK(spark: SparkSession, dir: String, k: Int = 200): DataFrame =
    documents(spark, dir)
      .select(explode(toks).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Vocabulary ENCODING — the tokenizer-apply step between corpus prep
    * and training: map every token to its id in a frequency-ranked top-V
    * vocabulary (rank 1 = most frequent; out-of-vocabulary → 0), emitting
    * per-doc id sequences plus an OOV count.
    *
    * Scale shape: the vocab build is ONE explode + partial-combine count
    * + distributed top-V (`orderBy.limit` = TakeOrdered, never a global
    * sort); ranking by window runs on the already-limited V rows. The
    * encode join BROADCASTS the V-row vocab — the corpus streams through
    * explode → broadcast join → one groupBy(doc_id) reassembly, so no
    * shuffle ever carries token strings except the count itself. Ids are
    * emitted as a comma-joined string (a portable exchange form, and
    * hash-comparable to the DuckDB oracle). */
  def vocabEncode(spark: SparkSession, dir: String, v: Int = 1000): DataFrame = {
    val exploded = documents(spark, dir)
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "w")))
    val top = exploded.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(v)
    // the window ranks V rows post-limit — single tiny partition by design
    val vocab = top.withColumn("id",
      row_number().over(Window.orderBy(col("cnt").desc, col("w"))))
      .select(col("w"), col("id"))
    exploded.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("pos"),
            coalesce(col("id"), lit(0)).as("id")))),
          s => s.getField("id").cast(StringType))).as("ids"),
        sum(when(col("id").isNull, 1).otherwise(0)).cast(LongType).as("n_oov"))
      .orderBy("doc_id")
  }

  /** Deterministic train/val/test assignment by hashed id — the split
    * must be STABLE across runs, engines, and corpus growth (a doc's
    * split never changes when other docs are added), which rules out
    * row_number/rand and leaves content-free id hashing. md5 is the
    * cross-engine-reproducible choice (same reasoning as
    * [[TextOps.stratifiedSample]]); the first 8 hex chars give a uniform
    * 32-bit bucket. Pure map-side — no shuffle, no state, no seed
    * coordination at any scale. */
  def splitStable(spark: SparkSession, dir: String,
                  trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"need 0 <= trainPct, 0 <= valPct, trainPct + valPct <= 100; " +
        s"got trainPct=$trainPct valPct=$valPct")
    documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .withColumn("bucket",
        (conv(substring(md5(col("doc_id").cast(StringType)), 1, 8), 16, 10)
          .cast(LongType) % 100).cast(IntegerType))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .orderBy("doc_id")
  }

  /** Sliding-window chunking with overlap (RAG / long-context prep):
    * cut each doc into `window`-token chunks every `stride` tokens, so
    * consecutive chunks share `window - stride` tokens of context. The
    * final chunk of a doc may be shorter (no padding here — that is the
    * packer's job), but a start whose window would sit ENTIRELY inside
    * the previous chunk's coverage is not emitted — it would duplicate
    * already-chunked text verbatim into the output corpus. Map-side HOF
    * + one explode; chunk boundaries depend only on the doc itself, so
    * the op shards trivially at any scale. */
  def chunkOverlap(spark: SparkSession, dir: String,
                   window: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && window >= stride,
      s"need window >= stride > 0, got window=$window stride=$stride")
    documents(spark, dir)
      .select(col("doc_id"), toks.as("tk"))
      .select(col("doc_id"),
        explode(transform(
          // keep start s iff it is the first chunk or the PREVIOUS chunk
          // (start s-stride, end min(s-stride+window-1, n)) did not
          // already reach the doc end: s + window - stride - 1 < n
          filter(
            sequence(lit(1), greatest(size(col("tk")), lit(1)), lit(stride)),
            s => s === 1 || s + lit(window - stride - 1) < size(col("tk"))),
          s => struct(s.cast(LongType).as("chunk_start"),
            concat_ws(" ", slice(col("tk"), s, lit(window))).as("chunk_text"))))
          .as("c"))
      .select(col("doc_id"), col("c.chunk_start"),
        size(split(col("c.chunk_text"), " ")).cast(LongType).as("n_chunk_tok"),
        col("c.chunk_text"))
      .orderBy("doc_id", "chunk_start")
  }

  /** N-gram LM cross-entropy scoring — the CCNet-style quality filter
    * that ranks documents by how "expected" their text is under a
    * language model trained on a reference corpus (CCNet trains KenLM
    * on Wikipedia and buckets Common Crawl by perplexity; the
    * mechanics — n-gram counts → per-doc average negative
    * log-likelihood — are identical, here self-trained on the corpus).
    * Bigram model with add-one (Laplace) smoothing:
    * `P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)`; the score is the
    * doc-average of `-log2 P` over its bigrams — bits per token. Low =
    * text the corpus LM predicts well (fluent or boilerplate), high =
    * statistical outlier (the tail a perplexity filter drops). Docs
    * with fewer than two tokens have no bigrams and are not scored.
    *
    * Scale shape: bigram construction is a map-side `zip_with` of the
    * token array against its own shift plus one explode; LM "training"
    * is one partial-combine groupBy per n-gram order; scoring re-joins
    * the doc bigrams to the two count tables — every shuffle is keyed
    * on the n-gram itself, the model is never collected or broadcast
    * by hand (AQE broadcasts it only if it is actually small), and the
    * vocabulary size rides along as a broadcast 1-row frame. At 100 TB
    * the count tables are themselves distributed tables, and swapping
    * the self-trained model for a reference-corpus model is the same
    * plan with `biCounts`/`uniCounts` read from the reference. */
  def lmScore(spark: SparkSession, dir: String): DataFrame = {
    val tk = documents(spark, dir).select(col("doc_id"), toks.as("t"))
    val bi = tk.where(size(col("t")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val biCounts = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val uniCounts = tk.select(explode(col("t")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocabSize = uniCounts.agg(count(lit(1)).as("v"))
    bi.join(biCounts, Seq("w1", "w2"))
      .join(uniCounts, Seq("w1"))
      .crossJoin(broadcast(vocabSize))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
        // HACKING rule 1: the per-bigram bits are doubles — average them
        // as an order-independent DECIMAL sum over one exact division,
        // not a partial-agg-order-dependent double AVG
        round(sum((-log2((col("c12") + lit(1.0)) / (col("c1") + col("v"))))
            .cast(DecimalType(30, 15))).cast(DoubleType) / count(lit(1)), 4)
          .as("bits_per_token"))
      .orderBy("doc_id")
  }

  /** Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen &
    * Goodman 1999's benchmark winner) — the production upgrade of
    * [[lmScore]]'s Laplace smoothing: absolute discount D=0.75 on seen
    * bigrams, with the discounted mass re-spent on the CONTINUATION
    * distribution (how many distinct contexts a word follows, not how
    * often it occurs — "Francisco" is frequent but only ever follows
    * "San", so its continuation probability is tiny):
    * `P(w|v) = max(c(v,w)−D, 0)/c(v·) + D·N1+(v·)/c(v·) · P_cont(w)`,
    * `P_cont(w) = N1+(·w)/N1+(··)`.
    *
    * Scale shape: all four statistics (bigram counts, context marginals,
    * forward/reverse distinct-continuation counts) fold out of ONE
    * bigram count table with n-gram-keyed aggs; scoring re-joins doc
    * bigrams to that table — same shuffle skeleton as [[lmScore]], no
    * new shapes. log2 outputs are 6-dp-rounded BEFORE the DECIMAL mean
    * (HACKING libm rule). Docs with <2 tokens are unscored. */
  def kneserNeyScore(spark: SparkSession, dir: String, discount: Double = 0.75): DataFrame = {
    val tk = documents(spark, dir).select(col("doc_id"), toks.as("t"))
    val bi = tk.where(size(col("t")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val biCounts = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint(true) // all four statistics + scoring read it
    // context marginal c(v·) and forward type count N1+(v·)
    val ctx = biCounts.groupBy(col("w1"))
      .agg(sum(col("c12")).as("cctx"), count(lit(1)).as("n1f"))
    // continuation: N1+(·w) and the global N1+(··)
    val rev = biCounts.groupBy(col("w2")).agg(count(lit(1)).as("n1r"))
    val tot = biCounts.agg(count(lit(1)).as("n1tot"))
    val d = lit(discount)
    bi.join(biCounts, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .join(rev, Seq("w2"))
      .crossJoin(broadcast(tot))
      .withColumn("p",
        greatest(col("c12") - d, lit(0.0)) / col("cctx") +
          d * col("n1f") / col("cctx") * (col("n1r") / col("n1tot")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
        round(sum(round(-log2(col("p")), 6)
            .cast(DecimalType(30, 15))).cast(DoubleType) / count(lit(1)), 4)
          .as("kn_bits_per_token"))
      .orderBy("doc_id")
  }

  private def kneserNeyOracle(discount: Double = 0.75): String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |bi AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
       |       FROM tk, UNNEST(range(1, len(t))) AS u(i) WHERE len(t) >= 2),
       |bc AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
       |ctx AS (SELECT w1, SUM(c12) AS cctx, count(*) AS n1f FROM bc GROUP BY 1),
       |rev AS (SELECT w2, count(*) AS n1r FROM bc GROUP BY 1),
       |tot AS (SELECT count(*) AS n1tot FROM bc),
       |sc AS (SELECT bi.doc_id,
       |         greatest(bc.c12 - $discount, 0.0) / ctx.cctx
       |           + $discount * ctx.n1f / ctx.cctx * (rev.n1r / (SELECT n1tot FROM tot)) AS p
       |       FROM bi JOIN bc USING (w1, w2) JOIN ctx USING (w1) JOIN rev USING (w2))
       |SELECT doc_id, count(*) AS n_bigrams,
       |  ROUND(CAST(SUM(CAST(ROUND(-log2(p), 6) AS DECIMAL(30,15))) AS DOUBLE)
       |          / count(*), 4) AS kn_bits_per_token
       |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Per-source distribution drift: KL divergence (bits) of each
    * source's unigram distribution from the corpus-wide distribution —
    * the monitoring signal that catches a source going off-domain (or a
    * scraper breaking) between corpus builds. `KL(P_s ‖ P) = Σ_w
    * p_s(w) · log2(p_s(w)/p(w))`; no smoothing needed because every
    * source word is by construction in the corpus (support(P_s) ⊆
    * support(P), so p(w) > 0 wherever p_s(w) > 0).
    *
    * Scale shape: one explode, two partial-combine groupBys keyed on
    * the token (per-source and corpus-wide), one token-keyed join, one
    * final groupBy(source) — output is O(sources). Totals ride along as
    * grouping keys / a broadcast 1-row frame; nothing driver-side. */
  def sourceKl(spark: SparkSession, dir: String): DataFrame = {
    val tok = documents(spark, dir).select(col("source"), explode(toks).as("w"))
    val bySrc = tok.groupBy(col("source"), col("w")).agg(count(lit(1)).as("nsw"))
    val srcTot = bySrc.groupBy(col("source")).agg(sum(col("nsw")).as("ns"))
    val corpus = bySrc.groupBy(col("w")).agg(sum(col("nsw")).as("nw"))
    val total = corpus.agg(sum(col("nw")).as("n"))
    bySrc.join(srcTot, Seq("source")).join(corpus, Seq("w"))
      .crossJoin(broadcast(total))
      .groupBy(col("source"))
      .agg(max(col("ns")).cast(LongType).as("n_tokens"),
        count(lit(1)).cast(LongType).as("vocab"),
        // HACKING rule 1: order-independent DECIMAL sum of the double
        // KL terms (the per-term arithmetic stays bit-identical to the
        // oracle; only the reduction order is pinned)
        round(sum(((col("nsw") / col("ns")) *
          log2((col("nsw") / col("ns")) / (col("nw") / col("n"))))
            .cast(DecimalType(30, 15))).cast(DoubleType), 4)
          .as("kl_bits"))
      .orderBy("source")
  }

  /** PMI collocation mining (Church & Hanks 1990): the top-N adjacent
    * word pairs whose co-occurrence most exceeds chance —
    * PMI(a,b) = log₂(P(a,b) / (P(a)P(b))) with P(a,b) = c_ab/N_bi and
    * P(w) = c_w/N_uni — the corpus-analysis staple behind phrase
    * detection, tokenizer-merge sanity checks, and boilerplate-phrase
    * discovery. A minimum pair count (Church & Hanks' frequency floor)
    * drops the unstable low-count tail BEFORE any join.
    *
    * Scale shape: bigram construction is a map-side zip_with; pair and
    * unigram counts are partial-combine groupBys keyed on the words
    * themselves; the min-count filter prunes the pair table before its
    * two unigram joins (vocabulary-sized, keyed — never corpus-sized);
    * totals ride along as a broadcast 1-row frame; the final top-N is a
    * distributed TakeOrdered. Determinism: counts are integers; the
    * ranking key is the EXACT probability ratio (identical float ops on
    * identical integers — no transcendental in the ordering); log₂
    * appears only in the displayed 6-dp PMI, the same contract as
    * [[lmScore]]. */
  def pmiCollocations(spark: SparkSession, dir: String,
                      minCount: Int = 5, topN: Int = 100): DataFrame = {
    val tk = documents(spark, dir).select(toks.as("t"))
    val bi = tk.where(size(col("t")) >= 2)
      .select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val biCounts = bi.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
    val uniCounts = tk.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val totals = tk.agg(sum(size(col("t"))).as("n_uni"),
      sum(size(col("t")) - 1).as("n_bi"))
    // association spelled out and mirrored in the oracle: identical op
    // order on identical integer-derived doubles → identical ratio
    val ratio = (col("c_ab").cast(DoubleType) * col("n_uni").cast(DoubleType)
        / col("c_a").cast(DoubleType)) *
      (col("n_uni").cast(DoubleType) / col("c_b").cast(DoubleType)) /
      col("n_bi").cast(DoubleType)
    val top = biCounts
      .join(uniCounts.withColumnRenamed("w", "w1").withColumnRenamed("c", "c_a"),
        Seq("w1"))
      .join(uniCounts.withColumnRenamed("w", "w2").withColumnRenamed("c", "c_b"),
        Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("r", ratio)
      .orderBy(col("r").desc, col("w1"), col("w2"))
      .limit(topN)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("r").desc, col("w1"), col("w2"))))
      .select(col("rank"), col("w1"), col("w2"), col("c_ab"),
        round(log2(col("r")), 6).as("pmi"))
      .orderBy("rank")
  }

  private def pmiOracle(minCount: Int = 5, topN: Int = 100): String =
    s"""WITH tk AS (SELECT string_split(text, ' ') AS t FROM documents),
       |bi AS (SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
       |       FROM tk, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
       |       WHERE len(t) >= 2),
       |bc AS (SELECT w1, w2, count(*) AS c_ab FROM bi GROUP BY w1, w2
       |       HAVING count(*) >= $minCount),
       |uni AS (SELECT w, count(*) AS c
       |        FROM (SELECT unnest(t) AS w FROM tk) GROUP BY w),
       |tot AS (SELECT sum(len(t)) AS n_uni, sum(len(t) - 1) AS n_bi FROM tk),
       |sc AS (SELECT bc.w1, bc.w2, bc.c_ab,
       |  (CAST(bc.c_ab AS DOUBLE) * CAST(tot.n_uni AS DOUBLE) / CAST(ua.c AS DOUBLE))
       |  * (CAST(tot.n_uni AS DOUBLE) / CAST(ub.c AS DOUBLE))
       |  / CAST(tot.n_bi AS DOUBLE) AS r
       |  FROM bc JOIN uni ua ON bc.w1 = ua.w JOIN uni ub ON bc.w2 = ub.w
       |  CROSS JOIN tot)
       |SELECT CAST(rn AS INT) AS rank, w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
       |       ROUND(log2(r), 6) AS pmi
       |FROM (SELECT *, row_number() OVER (ORDER BY r DESC, w1, w2) AS rn FROM sc)
       |WHERE rn <= $topN ORDER BY rank""".stripMargin

  /** DoReMi-style domain reweighting (Xie et al. 2023): one
    * exponentiated-gradient update of the training-mixture weights from
    * per-domain excess loss. The per-doc loss is the self-trained bigram
    * LM's bits/token ([[lmScore]] — playing DoReMi's small proxy model);
    * the reference loss is the corpus-wide mean (standing in for
    * DoReMi's reference model, documented substitution). Per domain
    * (`source`): excess_d = max(0, mean_loss_d − ref_loss), then
    * α_d ∝ exp(η·excess_d) normalized over domains, smoothed with the
    * uniform mixture u: α ← (1−c)·α_norm + c/k. Domains whose proxy
    * finds hardest-relative-to-reference get upweighted — the published
    * recipe for choosing pretraining mixture proportions.
    *
    * Scale shape: everything through mean_loss_d is [[lmScore]]'s plan
    * plus one doc_id-keyed join and one domain-keyed partial-combine
    * agg; the EG update runs on the k-row domain frame (k = #domains —
    * metadata scale) with 1-row broadcast totals. Determinism: per-doc
    * losses are lmScore's exact rounded stats; domain/reference means
    * are DECIMAL sums (HACKING rule 1); exp is libm so e_d is rounded
    * to 9 dp BEFORE the (DECIMAL-summed) normalization — every input to
    * every division is identical cross-engine. */
  def doremiReweight(spark: SparkSession, dir: String,
                     eta: Double = 1.0, smooth: Double = 0.01): DataFrame = {
    val perDoc = lmScore(spark, dir).select(col("doc_id"), col("bits_per_token"))
      .join(documents(spark, dir).select(col("doc_id"), col("source")), Seq("doc_id"))
    val decMean = (c: Column) =>
      sum(c.cast(DecimalType(30, 15))).cast(DoubleType) / count(lit(1))
    val byDom = perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), decMean(col("bits_per_token")).as("mean_loss"))
    val ref = perDoc.agg(decMean(col("bits_per_token")).as("ref_loss"))
    val kf = byDom.agg(count(lit(1)).as("k"))
    val scored = byDom.crossJoin(broadcast(ref)).crossJoin(broadcast(kf))
      .withColumn("excess", greatest(lit(0.0), col("mean_loss") - col("ref_loss")))
      .withColumn("e", round(exp(lit(eta) * col("excess")), 9))
    val tot = scored.agg(
      sum(col("e").cast(DecimalType(30, 15))).cast(DoubleType).as("sum_e"))
    scored.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        round(col("mean_loss"), 6).as("mean_loss"),
        round(col("excess"), 6).as("excess"),
        round(lit(1.0 - smooth) * (col("e") / col("sum_e"))
          + lit(smooth) / col("k"), 9).as("weight"))
      .orderBy("source")
  }

  /** The [[lmScore]] oracle's CTE chain as a reusable WITH-prefix ending
    * at per-doc `pl(doc_id, bits_per_token)`. */
  private def lmScoreSqlPrefix: String =
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bi AS (
      |  SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
      |  FROM tk, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
      |  WHERE len(t) >= 2),
      |bc AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
      |uni AS (SELECT w1, count(*) AS c1
      |        FROM (SELECT unnest(t) AS w1 FROM tk) GROUP BY w1),
      |v AS (SELECT count(*) AS v FROM uni),
      |pl AS (SELECT bi.doc_id,
      |  ROUND(CAST(SUM(CAST(-log2((c12 + 1.0) / (c1 + v.v)) AS DECIMAL(30,15))) AS DOUBLE)
      |        / count(*), 4) AS bits_per_token
      |FROM bi JOIN bc USING (w1, w2) JOIN uni ON bi.w1 = uni.w1 CROSS JOIN v
      |GROUP BY bi.doc_id)""".stripMargin

  private def doremiOracle(eta: Double = 1.0, smooth: Double = 0.01): String =
    s"""$lmScoreSqlPrefix,
       |pd AS (SELECT pl.doc_id, pl.bits_per_token, d.source
       |       FROM pl JOIN documents d ON pl.doc_id = d.doc_id),
       |dom AS (SELECT source, count(*) AS n_docs,
       |  CAST(SUM(CAST(bits_per_token AS DECIMAL(30,15))) AS DOUBLE) / count(*) AS mean_loss
       |  FROM pd GROUP BY source),
       |ref AS (SELECT
       |  CAST(SUM(CAST(bits_per_token AS DECIMAL(30,15))) AS DOUBLE) / count(*) AS ref_loss
       |  FROM pd),
       |kf AS (SELECT count(*) AS k FROM dom),
       |sc AS (SELECT dom.*, ref.ref_loss, kf.k,
       |  greatest(0.0, mean_loss - ref_loss) AS excess,
       |  ROUND(exp($eta * greatest(0.0, mean_loss - ref_loss)), 9) AS e
       |  FROM dom CROSS JOIN ref CROSS JOIN kf),
       |tot AS (SELECT CAST(SUM(CAST(e AS DECIMAL(30,15))) AS DOUBLE) AS sum_e FROM sc)
       |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       |  ROUND(mean_loss, 6) AS mean_loss,
       |  ROUND(excess, 6) AS excess,
       |  ROUND(${1.0 - smooth} * (e / sum_e) + $smooth / k, 9) AS weight
       |FROM sc CROSS JOIN tot ORDER BY source""".stripMargin

  /** Heaps'-law vocabulary-growth audit: vocabulary size, token mass and
    * type-token ratio at 10 corpus-prefix checkpoints — the curve that
    * tells a corpus builder whether more data still buys new vocabulary
    * (Heaps 1978: V ≈ K·n^β) and catches ingestion anomalies (a flat
    * segment = duplicated shard; a spike = a new source's domain).
    * Checkpoints are ingestion-key prefixes (`doc_id ≤ i/10 · max_id`) —
    * value cuts, not rank cuts, so NO global sort exists anywhere in
    * the plan (documented substitution: doc_id is the monotone
    * ingestion key, so value cuts are time cuts).
    *
    * Scale shape: one explode; token counts and first-occurrence
    * buckets are vocabulary-keyed partial-combine groupBys; max_id
    * rides along as a broadcast 1-row frame; cumulative sums run on the
    * 10-row checkpoint frame. Determinism: everything is integer until
    * the final TTR division (checkpoint bucketing is ceil of an exact
    * double quotient of two sub-2⁵³ longs — identical cross-engine). */
  def vocabGrowth(spark: SparkSession, dir: String,
                  buckets: Int = 10): DataFrame = {
    val d = documents(spark, dir).select(col("doc_id"), toks.as("t"))
    val maxId = d.agg(max(col("doc_id")).as("max_id"))
    val bCol = greatest(lit(1), least(lit(buckets),
      ceil(col("doc_id").cast(DoubleType) * buckets / col("max_id"))
        .cast(IntegerType))).as("b")
    val occ = d.select(col("doc_id"), explode(col("t")).as("w"))
      .crossJoin(broadcast(maxId))
      .select(bCol, col("w"))
    val docsPerB = d.crossJoin(broadcast(maxId)).select(bCol)
      .groupBy(col("b")).agg(count(lit(1)).as("nd"))
    val occPerB = occ.groupBy(col("b")).agg(count(lit(1)).as("no"))
    val newVocabPerB = occ.groupBy(col("w")).agg(min(col("b")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("nv"))
    val w = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, 0)
    spark.range(1, buckets + 1).select(col("id").cast(IntegerType).as("b"))
      .join(docsPerB, Seq("b"), "left")
      .join(occPerB, Seq("b"), "left")
      .join(newVocabPerB, Seq("b"), "left")
      .select(col("b"), coalesce(col("nd"), lit(0L)).as("nd"),
        coalesce(col("no"), lit(0L)).as("no"), coalesce(col("nv"), lit(0L)).as("nv"))
      .select((col("b") * (100 / buckets)).as("pct"),
        sum(col("nd")).over(w).as("n_docs"),
        sum(col("no")).over(w).as("n_tokens"),
        sum(col("nv")).over(w).as("vocab"))
      .withColumn("ttr", // a prefix before the first doc has no tokens:
        // TTR is undefined there — NULL, mirrored in the oracle
        when(col("n_tokens") > 0,
          round(col("vocab").cast(DoubleType) / col("n_tokens"), 6)))
      .orderBy("pct")
  }

  private def vocabGrowthOracle(buckets: Int = 10): String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |mx AS (SELECT max(doc_id) AS max_id FROM d),
       |db AS (SELECT greatest(1, least($buckets,
       |         CAST(ceil(CAST(doc_id AS DOUBLE) * $buckets / max_id) AS INT))) AS b, t
       |       FROM d CROSS JOIN mx),
       |occ AS (SELECT b, unnest(t) AS w FROM db),
       |dpb AS (SELECT b, count(*) AS nd FROM db GROUP BY b),
       |opb AS (SELECT b, count(*) AS no FROM occ GROUP BY b),
       |nvb AS (SELECT b, count(*) AS nv FROM (
       |          SELECT w, min(b) AS b FROM occ GROUP BY w) GROUP BY b),
       |g AS (SELECT CAST(i AS INT) AS b, COALESCE(nd, 0) AS nd,
       |             COALESCE(no, 0) AS no, COALESCE(nv, 0) AS nv
       |      FROM UNNEST(generate_series(1, $buckets)) AS u(i)
       |      LEFT JOIN dpb ON dpb.b = i LEFT JOIN opb ON opb.b = i
       |      LEFT JOIN nvb ON nvb.b = i),
       |c AS (SELECT b * ${100 / buckets} AS pct,
       |  CAST(SUM(nd) OVER wc AS BIGINT) AS n_docs,
       |  CAST(SUM(no) OVER wc AS BIGINT) AS n_tokens,
       |  CAST(SUM(nv) OVER wc AS BIGINT) AS vocab
       |FROM g WINDOW wc AS (ORDER BY b ROWS UNBOUNDED PRECEDING))
       |SELECT pct, n_docs, n_tokens, vocab,
       |       CASE WHEN n_tokens > 0
       |            THEN ROUND(CAST(vocab AS DOUBLE) / n_tokens, 6) END AS ttr
       |FROM c ORDER BY pct""".stripMargin

  /** Token-length histogram in power-of-two buckets — the length profile
    * that drives packing efficiency and truncation policy for a training
    * corpus. One partial-combine aggregation over a map-side bucket
    * expression; output is O(log max_len) rows at any corpus size. */
  def lengthBuckets(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(floor(log2(greatest(size(toks), lit(1)).cast(DoubleType)))
        .cast(IntegerType).as("bucket"),
        size(toks).cast(LongType).as("n_tok"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))
      .select(col("bucket"),
        pow(lit(2.0), col("bucket")).cast(LongType).as("bucket_lo"),
        (pow(lit(2.0), col("bucket") + 1) - 1).cast(LongType).as("bucket_hi"),
        col("n_docs"), col("total_tokens"))
      .orderBy("bucket")

  /** Training-mixture composition (domain mixing): fill each source's
    * char budget greedily in stable hash order — the Pile/Dolma-style op
    * that turns "40% web, 30% code, …" target weights into a concrete
    * document selection. Per-source caps here derive from the source id
    * (so the query survives fixture regeneration); a real pipeline passes
    * its weight table. A doc is selected iff its source's budget was not
    * exhausted BEFORE it (greedy fill, one overshoot doc allowed) — the
    * same stable-hash ordering as [[splitStable]], so the selection never
    * churns when other sources change. One window over a shuffle by
    * source; at 100 TB the per-source running sum becomes the
    * quantile-sketch cutoff (estimate the hash-rank boundary, then pure
    * map-side filter) — same contract, no per-source serial scan. */
  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    val srcNum = coalesce(expr("try_cast(substring(source, 4, 10) AS int)"), lit(0))
    val cap = (lit(1000L) + lit(500L) * (srcNum % 4)).cast(LongType)
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
    documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("mix_rank", row_number().over(w))
      .withColumn("cum_chars",
        sum(col("n_chars")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cap_chars", cap)
      .withColumn("selected", col("cum_chars") - col("n_chars") < cap)
      .orderBy("doc_id")
  }

  /** Two-phase quantile-cutoff domain mixing — [[domainMix]]'s own
    * doc-comment names this as its 100 TB path; here it is a first-class
    * query whose ORACLE IS the doc-level greedy selection, so the hash
    * match proves scale-path ≡ exact-path on every round.
    *
    * Phase 1 replaces the per-source full-length running-sum window with
    * a 4096-bin aggregate: bin = first 3 hex digits of md5(doc_id).
    * Ordering by (bin, rest-of-hash, doc_id) IS ordering by the full
    * (md5, doc_id) key — same-width hex strings compare digit-wise — so
    * bins partition the greedy order into contiguous runs. A source's
    * bins then classify exactly:
    *   cum_before + bin_chars < cap  → every doc admitted (any doc's
    *     before-sum ≤ cum_before + bin_chars − its n_chars < cap),
    *   cum_before ≥ cap              → every doc rejected,
    *   otherwise                     → the ONE boundary bin per source,
    * and only boundary-bin docs (≈ source_docs/4096) run the doc-level
    * window, seeded with the bin-prefix cumulative sum. Phase 2 is a
    * map-side join against the tiny bin table. At 100 TB the window that
    * domainMix runs over every doc of the largest source becomes a
    * 4096-row-per-source metadata aggregate plus a window over a
    * 1/4096th sliver — no per-source serial scan of the corpus.
    * (The ≥-cap boundary condition also catches the pathological
    * zero-char-doc edge the strict-< classification would misplace.) */
  def domainMixQuantile(spark: SparkSession, dir: String): DataFrame = {
    val srcNum = coalesce(expr("try_cast(substring(source, 4, 10) AS int)"), lit(0))
    val cap = (lit(1000L) + lit(500L) * (srcNum % 4)).cast(LongType)
    val base = documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("cap_chars", cap)
      .withColumn("h", md5(col("doc_id").cast(StringType)))
      .withColumn("bin", conv(substring(col("h"), 1, 3), 16, 10).cast(IntegerType))
    val wBins = Window.partitionBy(col("source")).orderBy(col("bin"))
    val bins = base.groupBy(col("source"), col("bin"), col("cap_chars"))
      .agg(sum(col("n_chars")).as("bin_chars"))
      .withColumn("cum_before",
        coalesce(sum(col("bin_chars")).over(
          wBins.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("verdict",
        when(col("cum_before") >= col("cap_chars"), lit("reject"))
          .when(col("cum_before") + col("bin_chars") < col("cap_chars"), lit("admit"))
          .otherwise(lit("boundary")))
      .select(col("source"), col("bin"), col("cum_before"), col("verdict"))
    val tagged = base.join(bins, Seq("source", "bin"))
    val wDocs = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id")) // boundary docs: one bin/source
    val boundary = tagged.filter(col("verdict") === "boundary")
      .withColumn("before",
        col("cum_before") + coalesce(sum(col("n_chars")).over(
          wDocs.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("selected", col("before") < col("cap_chars"))
    tagged.filter(col("verdict") =!= "boundary")
      .withColumn("selected", col("verdict") === "admit")
      .select(col("doc_id"), col("source"), col("n_chars"), col("selected"))
      .unionByName(boundary
        .select(col("doc_id"), col("source"), col("n_chars"), col("selected")))
      .orderBy("doc_id")
  }

  private val domainMixQuantileOracle: String =
    // the DOC-LEVEL greedy (domainMix's law) — deliberately NOT the
    // bin decomposition: equality proves the two-phase path selects
    // the identical documents
    """WITH d AS (SELECT doc_id, source, n_chars,
      |  1000 + 500 * (COALESCE(TRY_CAST(substring(source, 4) AS INT), 0) % 4) AS cap,
      |  SUM(n_chars) OVER (PARTITION BY source
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      |    ROWS UNBOUNDED PRECEDING) AS cum
      |FROM documents)
      |SELECT doc_id, source, n_chars, (cum - n_chars < cap) AS selected
      |FROM d ORDER BY doc_id""".stripMargin

  // ---- BPE tokenizer training ----------------------------------------

  /** Initial symbol sequence of a word for BPE: characters + the
    * end-of-word marker. */
  private def bpeSyms(w: Column): Column =
    concat(split(w, ""), array(lit("</w>")))

  /** The counting core of BPE training, oracle-gated: adjacent
    * symbol-pair frequencies over the char-level vocab, weighted by word
    * frequency — exactly the statistic each merge step argmaxes over.
    * Classic shape: BPE trains on the WORD-FREQUENCY table, not the raw
    * corpus, so after the first groupBy every stage is vocab-sized.
    * Top-N with (count desc, pair) tie-break = deterministic at any
    * parallelism. */
  def bpePairCounts(spark: SparkSession, dir: String, topN: Int = 20): DataFrame = {
    val wf = documents(spark, dir)
      .select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    wf.select(col("freq"), bpeSyms(col("w")).as("s"))
      .select(col("freq"), explode(transform(sequence(lit(0), size(col("s")) - 2),
        i => struct(get(col("s"), i).as("l"), get(col("s"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("l"), col("r"))
      .limit(topN)
  }

  /** Byte-pair-encoding merge learning (Sennrich et al. 2016 — the
    * tokenizer-training loop): `nMerges` rounds of [count adjacent pairs
    * over the word-frequency table → argmax → merge that pair everywhere,
    * left to right]. Returns the learned merge list with each pair's
    * frequency at its selection step.
    *
    * Scale shape: the corpus collapses to the word-frequency table in one
    * shuffle; every merge round is a vocab-sized aggregation plus a
    * map-side HOF fold that rewrites symbol arrays — the per-round
    * `collect` is exactly ONE row (the argmax pair), and
    * `localCheckpoint` keeps the plan linear across rounds instead of
    * nesting `nMerges` lambda layers. No SQL oracle can express the
    * iterative argmax, so the query carries a driver-visible
    * reconstruction gate instead: after all merges every word's symbols
    * must still concatenate back to the original word — a fold bug
    * (dropped, duplicated, or misordered symbol) fails the run loudly. */
  def bpeMerges(spark: SparkSession, dir: String, nMerges: Int = 8): DataFrame = {
    import spark.implicits._
    val (_, merges) = bpeTrain(spark, dir, nMerges)
    merges.toDF("rank", "left", "right", "pair_freq").orderBy("rank")
  }

  /** Tokenizer APPLY: each distinct word's final subword split under the
    * `nMerges` learned merges — the encode table a trained BPE tokenizer
    * IS (at inference, encoding = longest-chain merge replay; serving
    * systems precompute exactly this word→pieces map for the hot
    * vocabulary). Same training loop as [[bpeMerges]], same lossless-
    * reconstruction gate; the oracle replays the identical unrolled
    * recursive-CTE fold and reads the final round's splits. */
  def bpeEncode(spark: SparkSession, dir: String, nMerges: Int = 8): DataFrame = {
    val (words, _) = bpeTrain(spark, dir, nMerges)
    words.select(col("w"), concat_ws(" ", col("syms")).as("bpe"),
      size(col("syms")).cast(IntegerType).as("n_pieces"),
      col("freq"))
      .orderBy("w")
  }

  /** Tokenizer FERTILITY evaluation — the metric that decides whether a
    * trained tokenizer suits a corpus (and each language in it): pieces
    * per word and chars per piece under the learned BPE merges, weighted
    * by actual corpus occurrences. High fertility on a language means
    * its text costs proportionally more sequence length per character —
    * the standard multilingual-tokenizer audit (mT5/XLM-R papers report
    * exactly this table).
    *
    * Scale shape: the encode table is vocab-sized after [[bpeTrain]]'s
    * one word-frequency shuffle; the corpus side is one explode joined
    * against that small table (Catalyst broadcasts it off the reported
    * stats), then a per-lang partial-combine aggregate — O(langs)
    * output. Ratios are single IEEE divisions of exact BIGINTs,
    * rounded at 6. */
  def bpeFertility(spark: SparkSession, dir: String, nMerges: Int = 8): DataFrame = {
    val (words, _) = bpeTrain(spark, dir, nMerges)
    val enc = words.select(col("w"),
      size(col("syms")).cast(IntegerType).as("n_pieces"))
    documents(spark, dir)
      .select(col("lang"), explode(toks).as("w"))
      .join(enc, Seq("w"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).cast(LongType).as("n_pieces"),
        sum(length(col("w"))).cast(LongType).as("n_chars"))
      .select(col("lang"), col("n_words"), col("n_pieces"),
        round(col("n_pieces").cast(DoubleType) / col("n_words"), 6)
          .as("fertility"),
        round(col("n_chars").cast(DoubleType) / col("n_pieces"), 6)
          .as("chars_per_piece"))
      .orderBy("lang")
  }

  private def bpeFertilityOracle(nMerges: Int = 8): String =
    s"""${bpeOraclePrefix(nMerges)},
       |enc AS (SELECT w, CAST(len(s) AS INT) AS n_pieces FROM w$nMerges),
       |g AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
       |  ROUND(CAST(SUM(n_pieces) AS DOUBLE) / count(*), 6) AS fertility,
       |  ROUND(CAST(SUM(len(g.w)) AS DOUBLE) / SUM(n_pieces), 6) AS chars_per_piece
       |FROM g JOIN enc USING (w) GROUP BY lang ORDER BY lang""".stripMargin

  private def bpeTrain(spark: SparkSession, dir: String, nMerges: Int)
      : (DataFrame, Seq[(Int, String, String, Long)]) = {
    var words = documents(spark, dir)
      .select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), bpeSyms(col("w")).as("syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val top = words
        // singleton guard: a fully-merged one-symbol word has no adjacent
        // pairs — without the filter, sequence(0, -1) yields a descending
        // [0, -1] index pair and a phantom (sym, null) group (mirrors the
        // oracle's WHERE len(s) >= 2)
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(get(col("syms"), i).as("l"), get(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, n))
        // left-to-right non-overlapping merge of (l, r), as an ordered
        // fold: append, or fuse with the accumulator's last symbol
        words = words.select(col("w"), col("freq"),
          when(size(col("syms")) < 2, col("syms")).otherwise(
            aggregate(slice(col("syms"), lit(2), size(col("syms"))),
              slice(col("syms"), lit(1), lit(1)),
              (acc, x) => when(element_at(acc, -1) === lit(l) && x === lit(r),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
                .otherwise(concat(acc, array(x))))).as("syms"))
          .localCheckpoint(true)
        rank += 1
      }
    }
    val corrupted = words
      .filter(concat_ws("", col("syms")) =!= concat(col("w"), lit("</w>"))).count()
    require(corrupted == 0,
      s"BPE merges corrupted $corrupted words — the merge fold is not lossless")
    (words, merges.toSeq)
  }

  /** DuckDB mirror of [[bpeMerges]] — the full iterative training loop
    * unrolled: per round, a pair-count aggregate, the (n DESC, l, r)
    * argmax, and the left-to-right non-overlapping merge fold replayed as
    * a RECURSIVE CTE whose accumulator is the partially-merged symbol
    * list (base case `[s[1]]`, step fuses `acc[-1]` with the next symbol
    * exactly like the Spark `aggregate` fold). An empty round (vocab
    * exhausted) yields an empty argmax CTE, which contributes no output
    * row and empties the remaining rounds — the same early-stop shape as
    * the Spark loop. Non-recursive CTEs carry MATERIALIZED hints:
    * DuckDB inlines plain CTEs, and re-expanding each round's upstream
    * chain inside the next round's recursion is exponential (the
    * unhinted form did not finish at sf0.001; hinted runs in 0.13s). */
  private def bpeMergesOracle(nMerges: Int = 8): String = {
    val out = (1 to nMerges).map(n =>
      s"""SELECT CAST($n AS INT) AS rank, l AS "left", r AS "right", n AS pair_freq FROM t$n""")
      .mkString("\n  UNION ALL ")
    s"""${bpeOraclePrefix(nMerges)}
       |SELECT * FROM (
       |  $out
       |) ORDER BY rank""".stripMargin
  }

  /** Encode oracle = the training replay's FINAL round splits. */
  private def bpeEncodeOracle(nMerges: Int = 8): String =
    s"""${bpeOraclePrefix(nMerges)}
       |SELECT w, array_to_string(s, ' ') AS bpe, CAST(len(s) AS INT) AS n_pieces,
       |  CAST(freq AS BIGINT) AS freq
       |FROM w$nMerges ORDER BY w""".stripMargin

  private def bpeOraclePrefix(nMerges: Int): String = {
    def round(n: Int): String =
      s"""pc$n AS MATERIALIZED (SELECT s[i] AS l, s[i+1] AS r, CAST(SUM(freq) AS BIGINT) AS n
         |       FROM w${n - 1}, UNNEST(range(1, len(s))) u(i) WHERE len(s) >= 2
         |       GROUP BY 1, 2),
         |t$n AS MATERIALIZED (SELECT l, r, n FROM pc$n ORDER BY n DESC, l, r LIMIT 1),
         |rec$n AS (
         |  SELECT w, freq, s, 1 AS i, [s[1]] AS acc FROM w${n - 1}
         |  UNION ALL
         |  SELECT rec$n.w, rec$n.freq, rec$n.s, rec$n.i + 1,
         |    CASE WHEN acc[-1] = t$n.l AND s[i+1] = t$n.r
         |         THEN list_append(list_slice(acc, 1, len(acc)-1), t$n.l || t$n.r)
         |         ELSE list_append(acc, s[i+1]) END
         |  FROM rec$n, t$n WHERE rec$n.i < len(rec$n.s)),
         |w$n AS MATERIALIZED (SELECT w, freq, acc AS s FROM rec$n WHERE i = len(s))""".stripMargin
    val rounds = (1 to nMerges).map(round).mkString(",\n")
    s"""WITH RECURSIVE
       |wf AS MATERIALIZED (SELECT w, count(*) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY w),
       |w0 AS MATERIALIZED (SELECT w, freq, list_append(string_split(w, ''), '</w>') AS s FROM wf),
       |$rounds""".stripMargin
  }


  /** Deterministic approximate quantiles from a MERGEABLE fixed-bin
    * histogram — the scale alternative to `percentile_approx` whose
    * output is bit-reproducible (and therefore hash-verifiable): exact
    * per-(group, bin) counts are a partial-combine aggregation that
    * merges associatively across any partitioning, and the quantile
    * estimate is linear interpolation inside the target bin — integer
    * counts + IEEE-exact arithmetic end to end, so unlike sketch-based
    * quantiles (approx_aggs' t-digest) the answer never depends on merge
    * order. Error is bounded by the bin width; at 100 TB the histogram
    * is O(groups x bins) however large the data. */
  def histogramQuantiles(spark: SparkSession, dir: String, binW: Int = 50,
                         qs: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    val counts = documents(spark, dir)
      .select(col("lang"), (col("n_chars") / binW).cast(IntegerType).as("bin"))
      .groupBy(col("lang"), col("bin")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang")).orderBy(col("bin"))
    val cum = counts
      .withColumn("cum", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("n")).over(Window.partitionBy(col("lang"))))
    val perQ = qs.map { q =>
      // target rank q*total: the estimate lives in the FIRST bin whose
      // cumulative count reaches it; interpolate linearly inside the bin
      val target = col("total") * q
      cum.filter(col("cum") >= target && (col("cum") - col("n")) < target)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("lang"), lit(q).as("q"),
          round(col("bin") * binW +
            (target - (col("cum") - col("n"))) / col("n") * binW, 4).as("est"))
    }
    perQ.reduce(_ unionAll _).orderBy("lang", "q")
  }

  /** Cross-document exact-substring span detection — the span-level
    * member of the dedup family (doc-level = dedup_exact, paragraph =
    * dedup_segments, THIS = Lee et al. 2022 "Deduplicating Training Data
    * Makes Language Models Better": remove every ≥minSpan-token substring
    * that also appears verbatim in another document).
    *
    * Spark-first substitute for the paper's suffix array: a token
    * position is COVERED when its k-gram occurs in ≥2 distinct docs;
    * covered positions expand to their k token indices, and maximal runs
    * of duplicated token indices are the union of all duplicated
    * ≥k-token substrings (a duplicated substring of length L ≥ k covers
    * precisely its L token indices via its L−k+1 grams). NOTE the
    * union semantics do NOT carry through the minSpan filter verbatim:
    * two abutting duplicated substrings each shorter than minSpan
    * (possibly matching DIFFERENT partner docs) splice into one
    * reported run of len ≥ minSpan even though no single ≥minSpan
    * substring is duplicated verbatim — reported spans are maximal
    * unions of duplicated ≥k grams, a (deliberate, oracle-mirrored)
    * superset of the paper's per-substring criterion. Runs shorter
    * than minSpan are dropped as incidental collisions.
    *
    * Scale shape: gram emission is one map-side posexplode; the df count
    * shuffles on md5(gram) (fixed-width key, never the text); covered
    * positions explode ×k on the DUPLICATED minority only; run grouping
    * is a per-doc window (doc-keyed, bounded partitions). No self-joins
    * at any scale — corpus growth only widens the gram-hash shuffle. */
  def exactSubstringSpans(spark: SparkSession, dir: String,
                          k: Int = 8, minSpan: Int = 12): DataFrame = {
    val d = documents(spark, dir).select(col("doc_id"), toks.as("tk"))
    val grams = d.filter(size(col("tk")) >= k)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("tk")) - k),
        i => md5(concat_ws(" ", slice(col("tk"), i + 1, lit(k)))))))
      .toDF("doc_id", "pos", "gk")
    val dup = grams.groupBy(col("gk"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2).select("gk")
    val covered = grams.join(dup, Seq("gk"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("t"))
      .distinct()
    val w = Window.partitionBy(col("doc_id")).orderBy(col("t"))
    val spans = covered
      .withColumn("grp", col("t") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .filter(col("len") >= minSpan)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("len")).as("dup_tokens"),
        max(col("len")).as("max_span"))
    d.select(col("doc_id"), size(col("tk")).cast(LongType).as("n_tokens"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("max_span"), lit(0L)).as("max_span"))
      .orderBy("doc_id")
  }

  private def exactSubstringSpansOracle(k: Int = 8, minSpan: Int = 12): String =
    s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
       |p AS (SELECT doc_id, i - 1 AS pos, md5(array_to_string(tk[i:i+${k - 1}], ' ')) AS gk
       |      FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - ${k - 1})) AS i
       |            FROM d WHERE len(tk) >= $k)),
       |dup AS (SELECT gk FROM p GROUP BY gk HAVING count(DISTINCT doc_id) >= 2),
       |cov AS (SELECT DISTINCT doc_id, t FROM (
       |  SELECT p.doc_id, unnest(generate_series(p.pos, p.pos + ${k - 1})) AS t
       |  FROM p SEMI JOIN dup ON p.gk = dup.gk)),
       |r AS (SELECT doc_id, t,
       |        t - row_number() OVER (PARTITION BY doc_id ORDER BY t) AS grp FROM cov),
       |s AS (SELECT doc_id, grp, count(*) AS len FROM r GROUP BY 1, 2
       |      HAVING count(*) >= $minSpan),
       |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |        CAST(SUM(len) AS BIGINT) AS dup_tokens,
       |        CAST(MAX(len) AS BIGINT) AS max_span FROM s GROUP BY 1)
       |SELECT d.doc_id, CAST(len(d.tk) AS BIGINT) AS n_tokens,
       |  COALESCE(a.n_spans, 0) AS n_spans, COALESCE(a.dup_tokens, 0) AS dup_tokens,
       |  COALESCE(a.max_span, 0) AS max_span
       |FROM d LEFT JOIN a ON d.doc_id = a.doc_id ORDER BY d.doc_id""".stripMargin

  /** T5-style span-corruption example construction (Raffel et al. 2020
    * §3.1.4): the masking pass that turns a clean corpus into denoising
    * (input, target) training pairs — ~15% of tokens hidden in short
    * spans, each span replaced by one sentinel in the input and emitted
    * after the same sentinel in the target.
    *
    * Noise is DETERMINISTIC: position p of doc d starts a raw span when
    * the first 15 md5(d:p) hex digits % 20 == 0 (5% starts × mean length
    * 3 ≈ 15% coverage), with length 2 + (second 15 hex digits) % 3 ∈
    * {2,3,4} — two independent digit blocks, no integer division (`/` is
    * FLOAT division on integers in BOTH engines, and a 60-bit hash
    * exceeds double precision). A position is masked iff
    * one of its 4 predecessors (offset o ∈ 0..3) starts a span longer
    * than o — a PURE MAP re-derivation per position, no start-explode
    * join at any scale. Overlapping raw spans merge into maximal runs
    * (lag + running sum of run starts, one per-doc window); sentinel ids
    * number the merged runs. The whole construction — hash, mask
    * algebra, run merge, ordered reassembly — replays verbatim in the
    * DuckDB oracle. */
  def spanCorruption(spark: SparkSession, dir: String): DataFrame = {
    def hAt(pos: Column, off: Int): Column =
      conv(substring(md5(concat(col("doc_id").cast(StringType), lit(":"),
        pos.cast(StringType))), 1 + off, 15), 16, 10).cast(LongType)
    def startsAt(pos: Column): Column = pos >= 0 && hAt(pos, 0) % 20 === 0
    def lenAt(pos: Column): Column = lit(2) + hAt(pos, 15) % 3
    val pos = documents(spark, dir)
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "token")))
      .withColumn("masked", (0 to 3).map(o =>
        startsAt(col("pos") - o) && lenAt(col("pos") - o) > o).reduce(_ || _))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = pos
      .withColumn("run_start",
        col("masked") && !coalesce(lag(col("masked"), 1).over(wDoc), lit(false)))
      .withColumn("span_id",
        sum(when(col("run_start"), 1L).otherwise(0L)).over(wDoc) - 1)
    val sentinel = concat(lit("<extra_id_"), col("span_id").cast(StringType), lit(">"))
    val pieces = spans
      .withColumn("in_piece",
        when(col("run_start"), sentinel)
          .when(!col("masked"), col("token")))
      .withColumn("tg_piece",
        when(col("run_start"), concat(sentinel, lit(" "), col("token")))
          .when(col("masked"), col("token")))
    def joined(piece: String): Column = array_join(transform(
      array_sort(collect_list(when(col(piece).isNotNull,
        struct(col("pos"), col(piece).as("p"))))),
      x => x.getField("p")), " ")
    pieces.groupBy(col("doc_id"))
      .agg(joined("in_piece").as("input_text"),
        joined("tg_piece").as("target_text"),
        sum(when(col("run_start"), 1L).otherwise(0L)).as("n_spans"),
        sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"),
        count(lit(1)).as("n_tokens"))
      .orderBy("doc_id")
  }

  private def spanCorruptionOracle: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS token,
      |         generate_subscripts(string_split(text,' '), 1) - 1 AS pos
      |       FROM documents),
      |m AS (SELECT doc_id, pos, token,
      |    (pos >= 0 AND CAST('0x' || substring(md5(doc_id || ':' || CAST(pos AS VARCHAR)),1,15) AS BIGINT) % 20 = 0
      |       AND 2 + CAST('0x' || substring(md5(doc_id || ':' || CAST(pos AS VARCHAR)),16,15) AS BIGINT) % 3 > 0)
      | OR (pos >= 1 AND CAST('0x' || substring(md5(doc_id || ':' || CAST(pos-1 AS VARCHAR)),1,15) AS BIGINT) % 20 = 0
      |       AND 2 + CAST('0x' || substring(md5(doc_id || ':' || CAST(pos-1 AS VARCHAR)),16,15) AS BIGINT) % 3 > 1)
      | OR (pos >= 2 AND CAST('0x' || substring(md5(doc_id || ':' || CAST(pos-2 AS VARCHAR)),1,15) AS BIGINT) % 20 = 0
      |       AND 2 + CAST('0x' || substring(md5(doc_id || ':' || CAST(pos-2 AS VARCHAR)),16,15) AS BIGINT) % 3 > 2)
      | OR (pos >= 3 AND CAST('0x' || substring(md5(doc_id || ':' || CAST(pos-3 AS VARCHAR)),1,15) AS BIGINT) % 20 = 0
      |       AND 2 + CAST('0x' || substring(md5(doc_id || ':' || CAST(pos-3 AS VARCHAR)),16,15) AS BIGINT) % 3 > 3)
      |    AS masked
      |  FROM tok),
      |r AS (SELECT doc_id, pos, token, masked,
      |        masked AND NOT COALESCE(lag(masked) OVER (PARTITION BY doc_id ORDER BY pos), FALSE) AS run_start
      |      FROM m),
      |s AS (SELECT doc_id, pos, token, masked, run_start,
      |        SUM(CASE WHEN run_start THEN 1 ELSE 0 END) OVER
      |          (PARTITION BY doc_id ORDER BY pos) - 1 AS span_id
      |      FROM r),
      |p AS (SELECT doc_id, pos, masked, run_start,
      |        CASE WHEN run_start THEN '<extra_id_' || CAST(span_id AS VARCHAR) || '>'
      |             WHEN NOT masked THEN token END AS in_piece,
      |        CASE WHEN run_start THEN '<extra_id_' || CAST(span_id AS VARCHAR) || '> ' || token
      |             WHEN masked THEN token END AS tg_piece
      |      FROM s)
      |SELECT doc_id,
      |  COALESCE(string_agg(in_piece, ' ' ORDER BY pos) FILTER (WHERE in_piece IS NOT NULL), '') AS input_text,
      |  COALESCE(string_agg(tg_piece, ' ' ORDER BY pos) FILTER (WHERE tg_piece IS NOT NULL), '') AS target_text,
      |  CAST(SUM(CASE WHEN run_start THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
      |  CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
      |  count(*) AS n_tokens
      |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Fill-in-the-middle transform (Bavarian et al. 2022, "FIM") — the
    * document rewrite that teaches a causal LM to infill: split the
    * token sequence at two pivots into (prefix, middle, suffix) and emit
    * the PSM reordering `prefix <SUF> suffix <MID> middle`, applied to
    * half the corpus (the paper's mixed-objective recipe; untouched docs
    * pass through). Pivots are md5-derived from SEPARATE digit blocks
    * (HACKING: never divide one hash — blocks 1-15 and 17-31 are
    * independent), so the transform is deterministic, content-free, and
    * cross-engine replayable. The digest of the reordered token stream
    * rides the oracle, pinning the exact slice arithmetic. Pure map
    * stage — no shuffle at any scale. */
  def fimTransform(spark: SparkSession, dir: String): DataFrame = {
    val n = size(toks)
    val h = md5(col("doc_id").cast(StringType))
    val a = (conv(substring(h, 1, 15), 16, 10).cast(LongType) % (n + 1)).cast(IntegerType)
    val b = (conv(substring(h, 17, 15), 16, 10).cast(LongType) % (n + 1)).cast(IntegerType)
    val p1 = least(a, b); val p2 = greatest(a, b)
    val applied = pmod(col("doc_id"), lit(2)) === 0
    val psm = concat(
      slice(toks, lit(1), p1), array(lit("<SUF>")),
      slice(toks, p2 + 1, n - p2), array(lit("<MID>")),
      slice(toks, p1 + 1, p2 - p1))
    documents(spark, dir)
      .select(col("doc_id"), n.as("n_tok"), p1.as("p1"), p2.as("p2"),
        applied.as("applied"),
        md5(concat_ws(" ", when(applied, psm).otherwise(toks))).as("fim_digest"))
      .orderBy("doc_id")
  }

  private val fimTransformOracle: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS l,
      |    len(string_split(text, ' ')) AS n,
      |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS ha,
      |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 17, 15) AS BIGINT) AS hb
      |  FROM documents),
      |p AS (SELECT doc_id, l, CAST(n AS INT) AS n_tok,
      |        CAST(least(ha % (n + 1), hb % (n + 1)) AS INT) AS p1,
      |        CAST(greatest(ha % (n + 1), hb % (n + 1)) AS INT) AS p2,
      |        (doc_id % 2 = 0) AS applied
      |      FROM d)
      |SELECT doc_id, n_tok, p1, p2, applied,
      |  md5(array_to_string(
      |    CASE WHEN applied
      |      THEN l[1:p1] || ['<SUF>'] || l[(p2+1):n_tok] || ['<MID>'] || l[(p1+1):p2]
      |      ELSE l END, ' ')) AS fim_digest
      |FROM p ORDER BY doc_id""".stripMargin


  /** CCNet's head/middle/tail perplexity split (Wenzek et al. 2020) —
    * the quality partition that decided what went into most public
    * pretraining corpora: per language, rank documents by LM
    * bits-per-token (ascending: fluent text scores low) and cut the
    * ranking into thirds; "head" feeds training, "tail" is usually
    * dropped. Scoring reuses [[lmScore]]'s graded bigram-Laplace model
    * verbatim; ranking keys on the 4-dp-rounded bits (the precision the
    * `lm_perplexity` gate already proves identical cross-engine) with a
    * doc_id tiebreak, so the partition is bit-deterministic. Scale
    * shape: one rank window per language partition over (doc, bits)
    * rows — never raw text — plus the lmScore shuffles it inherits;
    * thirds come from the same window's count, no second pass. */
  def pplFilter(spark: SparkSession, dir: String): DataFrame = {
    val scored = lmScore(spark, dir)
      .join(documents(spark, dir).select(col("doc_id"), col("lang")), "doc_id")
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("bits_per_token").asc, col("doc_id"))
    scored
      .withColumn("ppl_rank", row_number().over(w))
      .withColumn("n_lang", count(lit(1)).over(Window.partitionBy(col("lang"))))
      .withColumn("part",
        when(col("ppl_rank") * 3 <= col("n_lang"), "head")
          .when(col("ppl_rank") * 3 <= col("n_lang") * 2, "middle")
          .otherwise("tail"))
      .select(col("doc_id"), col("lang"), col("bits_per_token"),
        col("ppl_rank"), col("part"))
      .orderBy("doc_id")
  }

  private val pplFilterOracle: String =
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bi AS (
      |  SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
      |  FROM tk, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
      |  WHERE len(t) >= 2),
      |bc AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
      |uni AS (SELECT w1, count(*) AS c1
      |        FROM (SELECT unnest(t) AS w1 FROM tk) GROUP BY w1),
      |v AS (SELECT count(*) AS v FROM uni),
      |scored AS (
      |  SELECT bi.doc_id,
      |    ROUND(CAST(SUM(CAST(-log2((c12 + 1.0) / (c1 + v.v)) AS DECIMAL(30,15))) AS DOUBLE)
      |          / count(*), 4) AS bits_per_token
      |  FROM bi JOIN bc USING (w1, w2) JOIN uni ON bi.w1 = uni.w1 CROSS JOIN v
      |  GROUP BY bi.doc_id),
      |r AS (SELECT s.doc_id, d.lang, s.bits_per_token,
      |        row_number() OVER (PARTITION BY d.lang
      |          ORDER BY s.bits_per_token ASC, s.doc_id) AS ppl_rank,
      |        count(*) OVER (PARTITION BY d.lang) AS n_lang
      |      FROM scored s JOIN documents d USING (doc_id))
      |SELECT doc_id, lang, bits_per_token, CAST(ppl_rank AS INT) AS ppl_rank,
      |  CASE WHEN ppl_rank * 3 <= n_lang THEN 'head'
      |       WHEN ppl_rank * 3 <= n_lang * 2 THEN 'middle'
      |       ELSE 'tail' END AS part
      |FROM r ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fim_transform" -> ((s, d) => fimTransform(s, d)),
    "span_corruption" -> ((s, d) => spanCorruption(s, d)),
    "lm_kneser_ney" -> ((s, d) => kneserNeyScore(s, d)),
    "exact_substring_spans" -> ((s, d) => exactSubstringSpans(s, d)),
    "bpe_pair_counts" -> ((s, d) => bpePairCounts(s, d)),
    "bpe_merges" -> ((s, d) => bpeMerges(s, d)),
    "bpe_encode" -> ((s, d) => bpeEncode(s, d)),
    "domain_mix" -> ((s, d) => domainMix(s, d)),
    "domain_mix_quantile" -> ((s, d) => domainMixQuantile(s, d)),
    "bpe_fertility" -> ((s, d) => bpeFertility(s, d)),
    "dedup_segments" -> ((s, d) => dedupSegments(s, d)),
    "pii_redact" -> ((s, d) => piiRedact(s, d)),
    "pack_sequences" -> ((s, d) => packSequences(s, d)),
    "vocab_topk" -> ((s, d) => vocabTopK(s, d)),
    // V=20 against the synthetic corpus's 31 distinct words, so both the
    // in-vocab and OOV paths are live in the oracle comparison
    "vocab_encode" -> ((s, d) => vocabEncode(s, d, v = 20)),
    "split_stable" -> ((s, d) => splitStable(s, d)),
    "chunk_overlap" -> ((s, d) => chunkOverlap(s, d)),
    "length_buckets" -> ((s, d) => lengthBuckets(s, d)),
    "histogram_quantiles" -> ((s, d) => histogramQuantiles(s, d)),
    "lm_perplexity" -> ((s, d) => lmScore(s, d)),
    "ppl_filter" -> ((s, d) => pplFilter(s, d)),
    "source_kl" -> ((s, d) => sourceKl(s, d)),
    "pmi_collocations" -> ((s, d) => pmiCollocations(s, d)),
    "doremi_reweight" -> ((s, d) => doremiReweight(s, d)),
    "vocab_growth" -> ((s, d) => vocabGrowth(s, d))
  )

  val oracles: Map[String, String] = Map(
    "fim_transform" -> fimTransformOracle,
    "span_corruption" -> spanCorruptionOracle,
    "lm_kneser_ney" -> kneserNeyOracle(),
    "exact_substring_spans" -> exactSubstringSpansOracle(),
    "pmi_collocations" -> pmiOracle(),
    "doremi_reweight" -> doremiOracle(),
    "vocab_growth" -> vocabGrowthOracle(),
    "bpe_merges" -> bpeMergesOracle(),
    "bpe_encode" -> bpeEncodeOracle(),
    "bpe_pair_counts" ->
      """WITH wf AS (SELECT w, count(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY w),
        |sy AS (SELECT freq, list_append(string_split(w, ''), '</w>') AS s FROM wf),
        |p AS (SELECT freq, s[i] AS l, s[i+1] AS r
        |      FROM sy, UNNEST(generate_series(1, len(s) - 1)) AS t(i))
        |SELECT l, r, CAST(SUM(freq) AS BIGINT) AS n
        |FROM p GROUP BY l, r
        |ORDER BY n DESC, l, r LIMIT 20""".stripMargin,
    "domain_mix_quantile" -> domainMixQuantileOracle,
    "bpe_fertility" -> bpeFertilityOracle(),
    "domain_mix" ->
      """WITH d AS (SELECT doc_id, source, n_chars,
        |  1000 + 500 * (COALESCE(TRY_CAST(substring(source, 4) AS INT), 0) % 4) AS cap,
        |  row_number() OVER w AS rn,
        |  SUM(n_chars) OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |FROM documents
        |WINDOW w AS (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id))
        |SELECT doc_id, source, n_chars, CAST(rn AS INT) AS mix_rank,
        |  CAST(cum AS BIGINT) AS cum_chars, CAST(cap AS BIGINT) AS cap_chars,
        |  (cum - n_chars < cap) AS selected
        |FROM d ORDER BY doc_id""".stripMargin,
    "dedup_segments" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |segs AS (
        |  SELECT doc_id, CAST(i AS INT) AS seg_pos,
        |         array_to_string(t[(CAST(i AS INT)*10+1):(CAST(i AS INT)*10+10)], ' ') AS seg
        |  FROM tk, UNNEST(range(CAST(ceil(len(t)/10.0) AS BIGINT))) AS u(i)),
        |freq AS (SELECT seg, count(DISTINCT doc_id) AS doc_freq FROM segs GROUP BY seg),
        |kept AS (SELECT s.doc_id, s.seg_pos, s.seg FROM segs s JOIN freq f USING (seg)
        |         WHERE f.doc_freq < 3),
        |rebuilt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |                   string_agg(seg, ' ' ORDER BY seg_pos) AS clean_text
        |            FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, CAST(ceil(len(string_split(d.text,' '))/10.0) AS BIGINT) AS n_segments,
        |       COALESCE(r.n_kept, 0) AS n_kept, COALESCE(r.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN rebuilt r USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "pii_redact" ->
      """WITH seeded AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN
        |      text || ' contact user' || doc_id || '@example.com or 555-01' ||
        |      lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
        |    ELSE text END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\b555-[0-9]{4}\b')) AS INT) AS n_phones,
        |  regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '\b555-[0-9]{4}\b', '<PHONE>', 'g') AS redacted
        |FROM seeded ORDER BY doc_id""".stripMargin,
    "vocab_topk" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 200""".stripMargin,
    "vocab_encode" ->
      """WITH c AS (
        |  SELECT w, count(*) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY w),
        |v AS (SELECT w, CAST(row_number() OVER (ORDER BY cnt DESC, w) AS INT) AS id
        |      FROM c ORDER BY cnt DESC, w LIMIT 20),
        |t AS (SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
        |      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))
        |SELECT t.doc_id,
        |  string_agg(CAST(coalesce(v.id, 0) AS VARCHAR), ',' ORDER BY t.pos) AS ids,
        |  CAST(sum(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |FROM t LEFT JOIN v ON t.tok = v.w
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "pack_sequences" ->
      """SELECT doc_id, lang, n_tok, tok_start,
        |       CAST(floor(tok_start / 512.0) AS BIGINT) AS pack_first,
        |       CAST(floor((tok_start + n_tok - 1) / 512.0) AS BIGINT) AS pack_last
        |FROM (
        |  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |         CAST(SUM(len(string_split(text, ' '))) OVER
        |           (PARTITION BY lang ORDER BY doc_id) - len(string_split(text, ' ')) AS BIGINT) AS tok_start
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "split_stable" ->
      """SELECT doc_id, lang,
        |  CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) % 100 AS INT) AS bucket,
        |  CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) % 100 < 80 THEN 'train'
        |       WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "chunk_overlap" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |c AS (
        |  SELECT doc_id, CAST(s AS BIGINT) AS chunk_start,
        |         array_to_string(t[CAST(s AS INT):CAST(s + 63 AS INT)], ' ') AS chunk_text
        |  FROM tk, UNNEST(generate_series(1, greatest(len(t), 1), 48)) AS u(s)
        |  WHERE s = 1 OR s + 15 < len(t))
        |SELECT doc_id, chunk_start,
        |       CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS n_chunk_tok,
        |       chunk_text
        |FROM c ORDER BY doc_id, chunk_start""".stripMargin,
    "length_buckets" ->
      """WITH b AS (
        |  SELECT CAST(floor(log2(greatest(len(string_split(text, ' ')), 1))) AS INT) AS bucket,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents)
        |SELECT bucket,
        |  CAST(power(2, bucket) AS BIGINT) AS bucket_lo,
        |  CAST(power(2, bucket + 1) - 1 AS BIGINT) AS bucket_hi,
        |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "histogram_quantiles" ->
      """WITH c AS (SELECT lang, CAST(n_chars // 50 AS INT) AS bin, count(*) AS n
        |           FROM documents GROUP BY lang, bin),
        |cm AS (SELECT *, sum(n) OVER (PARTITION BY lang ORDER BY bin
        |                              ROWS UNBOUNDED PRECEDING) AS cum,
        |              sum(n) OVER (PARTITION BY lang) AS total FROM c),
        |qq AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS q),
        |hit AS (SELECT cm.*, qq.q, cm.total * qq.q AS target,
        |          row_number() OVER (PARTITION BY lang, q ORDER BY bin) AS rn
        |        FROM cm, qq
        |        WHERE cm.cum >= cm.total * qq.q AND (cm.cum - cm.n) < cm.total * qq.q)
        |SELECT lang, q, ROUND(bin * 50 + (target - (cum - n)) / n * 50, 4) AS est
        |FROM hit WHERE rn = 1 ORDER BY lang, q""".stripMargin,
    "ppl_filter" -> pplFilterOracle,
    "lm_perplexity" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bi AS (
        |  SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
        |  FROM tk, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
        |  WHERE len(t) >= 2),
        |bc AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
        |uni AS (SELECT w1, count(*) AS c1
        |        FROM (SELECT unnest(t) AS w1 FROM tk) GROUP BY w1),
        |v AS (SELECT count(*) AS v FROM uni)
        |SELECT bi.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  ROUND(CAST(SUM(CAST(-log2((c12 + 1.0) / (c1 + v.v)) AS DECIMAL(30,15))) AS DOUBLE)
        |        / count(*), 4) AS bits_per_token
        |FROM bi JOIN bc USING (w1, w2) JOIN uni ON bi.w1 = uni.w1 CROSS JOIN v
        |GROUP BY bi.doc_id ORDER BY bi.doc_id""".stripMargin,
    "source_kl" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
        |bysrc AS (SELECT source, w, count(*) AS nsw FROM tok GROUP BY source, w),
        |srctot AS (SELECT source, sum(nsw) AS ns FROM bysrc GROUP BY source),
        |corpus AS (SELECT w, sum(nsw) AS nw FROM bysrc GROUP BY w),
        |tot AS (SELECT sum(nw) AS n FROM corpus)
        |SELECT b.source,
        |  CAST(max(s.ns) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS vocab,
        |  ROUND(CAST(SUM(CAST((nsw / CAST(s.ns AS DOUBLE)) *
        |    log2((nsw / CAST(s.ns AS DOUBLE)) / (nw / CAST(tot.n AS DOUBLE)))
        |    AS DECIMAL(30,15))) AS DOUBLE), 4) AS kl_bits
        |FROM bysrc b JOIN srctot s USING (source) JOIN corpus c ON b.w = c.w CROSS JOIN tot
        |GROUP BY b.source ORDER BY b.source""".stripMargin
  )
}
