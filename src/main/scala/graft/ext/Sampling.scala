package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Tables._

/** Corpus sampling / split-hygiene operators: cross-split leakage
  * detection, temperature-based language rebalancing, and one-pass
  * weighted sampling — the selection machinery between a cleaned corpus
  * and a training mixture.
  *
  * Engine-parity discipline (everything here is oracle-hashed): corpus
  * statistics stay integers as long as possible; the only float math is
  * IEEE-exact (`sqrt`, `/`, `*` are correctly rounded and identical on
  * any IEEE-754 engine — unlike libm's `pow`/`ln`/`exp`, which may
  * differ in the last ulp and are rounded wherever used). */
object Sampling {

  /** The stable md5 split-bucket of [[CorpusOps.splitStable]]. */
  private def splitOf(trainPct: Int = 80, valPct: Int = 10) = {
    val bucket = conv(substring(md5(col("doc_id").cast(StringType)), 1, 8), 16, 10)
      .cast(LongType) % 100
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Cross-split leakage check — the eval-integrity gate every training
    * pipeline needs: find val/test documents whose EXACT content also
    * appears in train (leaked eval data inflates benchmark scores). The
    * fixtures carry no exact text duplicates, so the query SEEDS
    * deterministic leaks first (docs with doc_id ≡ 3 (mod 7) take the
    * text of doc_id − 3 — the same in-query seeding pattern as
    * `pii_redact`), then detects them from scratch via content hash:
    * md5(text) as the dedup key, train-side hash counts, and a hash-keyed
    * join from the eval side.
    *
    * Scale shape: content hashes collapse each doc to 32 bytes before
    * the only shuffle (hash-keyed groupBy + join) — the standard exact
    * cross-corpus dedup plan; no text ever moves twice, no self-join on
    * the eval side. */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir).select(col("doc_id"), col("text"))
    val donor = d.select((col("doc_id") + 3).as("doc_id"), col("text").as("donor_text"))
    val seeded = d.join(donor, Seq("doc_id"), "left")
      .withColumn("text2",
        when(pmod(col("doc_id"), lit(7)) === 3 && col("donor_text").isNotNull,
          col("donor_text")).otherwise(col("text")))
      .select(col("doc_id"), md5(col("text2")).as("h"))
      .withColumn("split", splitOf())
    val trainCounts = seeded.filter(col("split") === "train")
      .groupBy(col("h")).agg(count(lit(1)).as("n_train_dups"))
    seeded.filter(col("split") =!= "train")
      .join(trainCounts, "h")
      .select(col("doc_id"), col("split"), col("n_train_dups"))
      .orderBy("doc_id")
  }

  private val splitLeakageOracle: String =
    """WITH d AS (SELECT doc_id, text FROM documents),
      |seeded AS (
      |  SELECT d.doc_id,
      |    md5(CASE WHEN d.doc_id % 7 = 3 AND b.text IS NOT NULL THEN b.text
      |             ELSE d.text END) AS h,
      |    CASE WHEN CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS UBIGINT) % 100 < 80 THEN 'train'
      |         WHEN CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS UBIGINT) % 100 < 90 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM d LEFT JOIN d b ON b.doc_id = d.doc_id - 3),
      |tc AS (SELECT h, count(*) AS n_train_dups FROM seeded WHERE split = 'train' GROUP BY h)
      |SELECT s.doc_id, s.split, CAST(tc.n_train_dups AS BIGINT) AS n_train_dups
      |FROM seeded s JOIN tc USING (h) WHERE s.split <> 'train'
      |ORDER BY s.doc_id""".stripMargin

  /** Temperature-based language rebalancing (the multilingual
    * α-sampling of XLM-R / mT5): sampling share q_l ∝ p_l^α flattens the
    * language distribution so high-resource languages stop drowning out
    * low-resource ones. α = 1/2 here, computed as `sqrt` — IEEE-exact on
    * every engine per element; the SUM of the sqrts goes through DECIMAL
    * so it is order-independent too, making per-language target counts
    * (floor of q_l × budget) bit-deterministic; budget = 40% of the
    * corpus, so the query is shape-identical across scale factors.
    * Selection within a language is the stable md5 order of
    * [[CorpusOps.splitStable]] — a doc's selection never churns as OTHER
    * languages grow.
    *
    * Scale shape: language stats are one tiny partial-combine agg
    * broadcast back; per-language ranking is one window over a shuffle
    * by lang (at 100 TB: the same quantile-cutoff upgrade as
    * [[CorpusOps.domainMix]] — estimate the md5-rank boundary, then pure
    * map-side filter). */
  def langTemperature(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir).select(col("doc_id"), col("lang"))
    val perLang = d.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    // per-element sqrt is IEEE-exact, but a raw double SUM of them is
    // partial-agg-order-dependent (HACKING determinism rule #1) — and
    // n_sel floors q·budget, so a last-ulp wobble in sqrt_sum could flip
    // a count at an integer boundary. Sum through DECIMAL (exact,
    // order-independent, identical elementwise cast on both engines).
    val totals = perLang.agg(
      sum(col("n_lang")).cast(DoubleType).as("n_total"),
      sum(sqrt(col("n_lang")).cast(DecimalType(30, 15)))
        .cast(DoubleType).as("sqrt_sum"))
    val targets = perLang.crossJoin(broadcast(totals))
      .withColumn("q", sqrt(col("n_lang")) / col("sqrt_sum"))
      .withColumn("n_sel",
        floor(col("q") * floor(col("n_total") * 0.4)).cast(LongType))
      .select(col("lang"), col("n_lang"), round(col("q"), 4).as("q_share"), col("n_sel"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
    d.withColumn("sel_rank", row_number().over(w))
      .join(broadcast(targets), "lang")
      .select(col("doc_id"), col("lang"), col("n_lang"), col("q_share"),
        col("n_sel"), col("sel_rank"), (col("sel_rank") <= col("n_sel")).as("selected"))
      .orderBy("doc_id")
  }

  private val langTemperatureOracle: String =
    """WITH pl AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
      |t AS (SELECT CAST(sum(n_lang) AS DOUBLE) AS n_total,
      |             CAST(sum(CAST(sqrt(n_lang) AS DECIMAL(30,15))) AS DOUBLE) AS sqrt_sum FROM pl),
      |tg AS (SELECT lang, n_lang, sqrt(n_lang) / sqrt_sum AS q,
      |         CAST(floor(sqrt(n_lang) / sqrt_sum * floor(n_total * 0.4)) AS BIGINT) AS n_sel
      |       FROM pl, t),
      |r AS (SELECT doc_id, lang,
      |        row_number() OVER (PARTITION BY lang
      |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sel_rank
      |      FROM documents)
      |SELECT r.doc_id, r.lang, CAST(tg.n_lang AS BIGINT) AS n_lang,
      |       ROUND(tg.q, 4) AS q_share, tg.n_sel, CAST(r.sel_rank AS INT) AS sel_rank,
      |       (r.sel_rank <= tg.n_sel) AS selected
      |FROM r JOIN tg USING (lang) ORDER BY r.doc_id""".stripMargin

  /** One-pass distributed weighted sampling without replacement
    * (Efraimidis–Spirakis 2006, exponential-jumps form): each row draws
    * a deterministic uniform u from its md5 (exact integer arithmetic),
    * takes key = −ln(u) / w with weight w = n_chars, and the k SMALLEST
    * keys are the weighted sample. This is THE scale shape for weighted
    * sampling: a single map stage computes keys, a distributed top-k
    * (TakeOrdered — no global sort, no second pass, no driver-side
    * weighting) selects the sample; merging partial top-ks is exactly
    * how it runs on 1000 executors. The ranking key is ROUNDED to 9
    * decimals (then doc_id) because `ln` is libm, not IEEE-exact — a
    * last-ulp difference between engines cannot reorder the sample. */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val u = (conv(substring(md5(col("doc_id").cast(StringType)), 1, 8), 16, 10)
      .cast(DoubleType) + 1.0) / 4294967296.0
    val key = round(-log(u) / col("n_chars"), 9)
    val top = documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), key.as("es_key"))
      .orderBy(col("es_key"), col("doc_id"))
      .limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("es_key"), col("doc_id"))))
      .orderBy("rank")
  }

  private def weightedSampleOracle(k: Int = 50): String =
    s"""WITH d AS (SELECT doc_id, n_chars,
       |  ROUND(-ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) + 1.0)
       |            / 4294967296.0) / n_chars, 9) AS es_key
       |FROM documents)
       |SELECT doc_id, n_chars, es_key, CAST(rn AS INT) AS rank FROM (
       |  SELECT *, row_number() OVER (ORDER BY es_key, doc_id) AS rn FROM d)
       |WHERE rn <= $k ORDER BY rank""".stripMargin

  /** Per-source corpus datasheet — the "data card" summary every corpus
    * release ships (docs, chars, tokens, language spread, heuristic-keep
    * rate per source). One partial-combine aggregation, O(sources)
    * output at any scale; every statistic is an integer sum/count or an
    * integer ratio (exact IEEE division), so the whole sheet
    * hash-verifies with no rounding at all. */
  def corpusDatasheet(spark: SparkSession, dir: String): DataFrame = {
    val t = split(col("text"), " ")
    val nTok = size(t)
    val stop = size(filter(t,
      x => x.isin(Seq("the", "be", "to", "of", "and", "that", "have", "with"): _*)))
    documents(spark, dir)
      .select(col("source"), col("lang"), col("n_chars"), nTok.as("n_tok"),
        (nTok >= 50 && stop >= 2).as("keep"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tok")).cast(LongType).as("total_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("keep").cast(IntegerType)).cast(LongType).as("n_keep"),
        (sum(col("n_tok")).cast(DoubleType) / count(lit(1))).as("mean_tokens"))
      .orderBy("source")
  }

  private val corpusDatasheetOracle: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
      |  count(DISTINCT lang) AS n_langs,
      |  CAST(sum(CASE WHEN n_tok >= 50 AND stop >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
      |  CAST(sum(n_tok) AS DOUBLE) / count(*) AS mean_tokens
      |FROM (SELECT source, lang, n_chars,
      |        len(string_split(text, ' ')) AS n_tok,
      |        len(list_filter(string_split(text, ' '),
      |          x -> x IN ('the','be','to','of','and','that','have','with'))) AS stop
      |      FROM documents)
      |GROUP BY source ORDER BY source""".stripMargin

  /** End-to-end corpus release — the full pipeline a training-data drop
    * actually runs, composed from this library's own pieces and closed
    * over the TABLE LAYER: quality-gate → exact content dedup → stable
    * split assignment → write a lang-partitioned
    * [[graft.table.GraftTable]] → reload the table FROM DISK and compute
    * the release manifest (per lang×split doc/char/token totals). The
    * oracle replays curation + dedup + split directly over the raw
    * parquet — so a hash match proves the governed write→commit→reload
    * roundtrip preserved every curated row bit-for-bit, not just that
    * the curation math agrees.
    *
    * Scale shape: curation is map-side; dedup is the md5-keyed window
    * (32-byte shuffle keys); the write shuffles once into identity
    * lang partitions (partition-pruned reads downstream); the manifest
    * is one partial-combine agg. */
  def corpusRelease(spark: SparkSession, dir: String): DataFrame = {
    import graft.table.{GraftTable, PartitionField}
    val t = split(col("text"), " ")
    val stop = size(filter(t,
      x => x.isin(Seq("the", "be", "to", "of", "and", "that", "have", "with"): _*)))
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    val curated = documents(spark, dir)
      .withColumn("n_tok", size(t))
      .filter(col("n_tok") >= 50 && stop >= 2)
      .withColumn("h", md5(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("split", splitOf())
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("n_tok"), col("split"), col("text"))
    val table = GraftTable.create(spark, tmp("corpus_release"), curated.schema,
      spec = Seq(PartitionField("lang", "identity")))
    table.append(curated)
    // reload FROM DISK — the release manifest reads the committed table,
    // not the in-flight frame
    GraftTable.load(spark, table.dir).toDF
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tok")).cast(LongType).as("total_tokens"))
      .orderBy("lang", "split")
  }

  private val corpusReleaseOracle: String =
    """WITH f AS (SELECT doc_id, lang, source, n_chars, text,
      |    len(string_split(text, ' ')) AS n_tok,
      |    len(list_filter(string_split(text, ' '),
      |      x -> x IN ('the','be','to','of','and','that','have','with'))) AS stop
      |  FROM documents),
      |cur AS (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |        FROM f WHERE n_tok >= 50 AND stop >= 2),
      |rel AS (SELECT doc_id, lang, n_chars, n_tok,
      |    CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) % 100 < 80 THEN 'train'
      |         WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) % 100 < 90 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM cur WHERE rn = 1)
      |SELECT lang, split, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(sum(n_tok) AS BIGINT) AS total_tokens
      |FROM rel GROUP BY lang, split ORDER BY lang, split""".stripMargin

  /** Curation audit — per-document LINEAGE for the cleaning pipeline:
    * every doc gets a verdict (`kept`) and, when dropped, the FIRST
    * pipeline stage that dropped it plus its evidence — `exact_dup`
    * (with the min-id representative of its token set — the doc that
    * proceeds to the later stages in its place), `quality` (token floor /
    * type-token-ratio floor), or `lang_cap` (per-language budget in the
    * stable md5 order). This is the explainability surface a production
    * pipeline ships next to the release: "why is my doc gone" answers
    * in one row. The set-dup key here is the PORTABLE md5 set digest
    * (not xxhash64) so the whole audit — including which twin survives —
    * hash-verifies against DuckDB.
    *
    * Scale shape: two windows (set-key min for representatives, per-lang
    * rank for the cap) and map-side feature math — no joins, no explode;
    * stage precedence is plain CASE logic so adding a stage is one more
    * WHEN on both sides. */
  def curationAudit(spark: SparkSession, dir: String, minTok: Int = 5,
                    minTtr: Double = 0.2, perLangCap: Int = 200): DataFrame = {
    val t = split(col("text"), " ")
    val setKey = md5(concat_ws("\u0001", array_sort(array_distinct(t))))
    val repW = Window.partitionBy(col("set_key"))
    val d = documents(spark, dir)
      .withColumn("set_key", setKey)
      .withColumn("n_tok", size(t))
      .withColumn("ttr", size(array_distinct(t)).cast(DoubleType) / size(t))
      .withColumn("rep", min(col("doc_id")).over(repW))
      .withColumn("is_exact_dup", col("doc_id") =!= col("rep"))
      .withColumn("bad_quality",
        col("n_tok") < minTok || col("ttr") < minTtr)
    // the cap ranks only docs that SURVIVED the earlier stages — same
    // md5 order as stratifiedSample/corpusClean
    d.withColumn("cap_rank",
        when(!col("is_exact_dup") && !col("bad_quality"),
          row_number().over(Window.partitionBy(col("lang"),
            col("is_exact_dup") || col("bad_quality"))
            .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))))
          .otherwise(lit(null)))
      .withColumn("stage",
        when(col("is_exact_dup"), "exact_dup")
          .when(col("bad_quality"), "quality")
          .when(col("cap_rank") > perLangCap, "lang_cap")
          .otherwise("kept"))
      .select(col("doc_id"), col("lang"), col("stage"),
        when(col("is_exact_dup"), col("rep")).otherwise(lit(-1L)).as("evidence"),
        (col("stage") === "kept").as("kept"))
      .orderBy("doc_id")
  }

  /** Canonical-copy selection for exact-duplicate groups — the dedup
    * refinement real pipelines run after grouping: instead of keeping
    * the FIRST copy (min doc_id, what [[curationAudit]] and plain exact
    * dedup do), keep the BEST copy by a quality key. Groups are the same
    * engine-portable md5 set digest as [[curationAudit]] (identical
    * distinct-token sets); the quality key is type-token ratio (higher =
    * less internal repetition — duplicates share distinct tokens but
    * differ in repetition/length), tiebreak doc_id. Only groups with ≥2
    * members emit (singletons have no decision to make).
    *
    * Determinism: ttr is one per-row integer/integer division (exact on
    * both engines); the winner rank is a window over (ttr DESC, doc_id).
    * Scale shape: one digest-keyed shuffle, window within groups —
    * identical cost to exact dedup. */
  def dedupCanonical(spark: SparkSession, dir: String): DataFrame = {
    val t = split(col("text"), " ")
    val gw = Window.partitionBy(col("set_key"))
    val rw = gw.orderBy(col("ttr").desc, col("doc_id"))
    documents(spark, dir)
      .withColumn("set_key", md5(concat_ws("\u0001", array_sort(array_distinct(t)))))
      .withColumn("ttr", size(array_distinct(t)).cast(DoubleType) / size(t))
      .withColumn("n_members", count(lit(1)).over(gw))
      .withColumn("pick", row_number().over(rw))
      .withColumn("min_id", min(col("doc_id")).over(gw))
      .filter(col("n_members") >= 2 && col("pick") === 1)
      .select(col("set_key"), col("n_members"),
        col("doc_id").as("canonical_id"), col("min_id"),
        round(col("ttr"), 4).as("canonical_ttr"),
        (col("doc_id") =!= col("min_id")).as("beats_first_copy"))
      .orderBy("set_key")
  }

  private val dedupCanonicalOracle: String =
    """WITH d AS (SELECT doc_id,
      |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), chr(1))) AS set_key,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS ttr
      |  FROM documents),
      |g AS (SELECT *, count(*) OVER (PARTITION BY set_key) AS n_members,
      |        row_number() OVER (PARTITION BY set_key ORDER BY ttr DESC, doc_id) AS pick,
      |        min(doc_id) OVER (PARTITION BY set_key) AS min_id
      |      FROM d)
      |SELECT set_key, CAST(n_members AS BIGINT) AS n_members,
      |       doc_id AS canonical_id, min_id, ROUND(ttr, 4) AS canonical_ttr,
      |       (doc_id <> min_id) AS beats_first_copy
      |FROM g WHERE n_members >= 2 AND pick = 1 ORDER BY set_key""".stripMargin

  /** Token-budget-constrained corpus selection — "give me the best docs
    * that fit in B training tokens": rank the corpus by a quality key,
    * admit docs in rank order while the running token total stays within
    * budget (greedy knapsack with unit value density, the shape of every
    * budgeted-pretraining data selection). Budget here is 30% of corpus
    * tokens (floor — integer-exact, scale-free).
    *
    * Determinism: quality is the exact per-row ttr ratio, the running
    * total is an INTEGER prefix sum over a total order (ttr DESC,
    * doc_id) — bit-exact on both engines, no float accumulation.
    *
    * Scale shape (the [[graft.ext.DistRank]] decomposition, graduated
    * here the way domain_mix graduated to `domain_mix_quantile`): the
    * corpus range-repartitions on the FULL greedy key (ttr DESC, doc_id
    * — a total order, so a million-doc ttr tie splits across partitions
    * by doc_id instead of stalling one window), rank and running token
    * sum compute per partition, and broadcast per-partition (row, token)
    * prefix offsets lift them to the global values. The offsets table is
    * one row per shuffle partition — metadata scale. The ORACLE is the
    * doc-level single-window greedy itself, unchanged: the hash match
    * proves the distributed decomposition selects identical docs with
    * identical ranks and running sums at any parallelism. */
  def tokenBudgetSelect(spark: SparkSession, dir: String,
                        budgetFrac: Double = 0.3): DataFrame = {
    val t = split(col("text"), " ")
    val d = documents(spark, dir)
      .select(col("doc_id"), size(t).as("n_tok"),
        (size(array_distinct(t)).cast(DoubleType) / size(t)).as("ttr"))
    val budget = d.agg(floor(sum(col("n_tok")) * budgetFrac).cast(LongType).as("budget"))
    val nParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = d.repartitionByRange(nParts, col("ttr").desc, col("doc_id"))
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy(col("__pid")).orderBy(col("ttr").desc, col("doc_id"))
    val local = parted
      .withColumn("__lrn", row_number().over(w).cast(LongType))
      .withColumn("__lcum", sum(col("n_tok").cast(LongType)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offs = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"), sum(col("n_tok").cast(LongType)).as("__tok"))
      .withColumn("__roff", coalesce(sum(col("__cnt")).over(
        Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__toff", coalesce(sum(col("__tok")).over(
        Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__roff"), col("__toff"))
    local.join(broadcast(offs), "__pid")
      .crossJoin(broadcast(budget))
      .withColumn("sel_rank", (col("__roff") + col("__lrn")).cast(IntegerType))
      .withColumn("cum_tokens", col("__toff") + col("__lcum"))
      .filter(col("cum_tokens") <= col("budget"))
      .select(col("doc_id"), col("n_tok"), round(col("ttr"), 4).as("ttr"),
        col("sel_rank"), col("cum_tokens"), col("budget"))
      .orderBy("sel_rank")
  }

  private def tokenBudgetOracle(budgetFrac: Double = 0.3): String =
    s"""WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS ttr
       |  FROM documents),
       |b AS (SELECT CAST(floor(sum(n_tok) * $budgetFrac) AS BIGINT) AS budget FROM d),
       |r AS (SELECT d.*, b.budget,
       |        row_number() OVER (ORDER BY ttr DESC, doc_id) AS sel_rank,
       |        sum(n_tok) OVER (ORDER BY ttr DESC, doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
       |      FROM d, b)
       |SELECT doc_id, CAST(n_tok AS INT) AS n_tok, ROUND(ttr, 4) AS ttr,
       |       CAST(sel_rank AS INT) AS sel_rank,
       |       CAST(cum_tokens AS BIGINT) AS cum_tokens, budget
       |FROM r WHERE cum_tokens <= budget ORDER BY sel_rank""".stripMargin

  private def curationAuditOracle(minTok: Int = 5, minTtr: Double = 0.2,
                                  perLangCap: Int = 200): String =
    s"""WITH d AS (SELECT doc_id, lang,
       |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), chr(1))) AS set_key,
       |    len(string_split(text, ' ')) AS n_tok,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS ttr
       |  FROM documents),
       |f AS (SELECT *, min(doc_id) OVER (PARTITION BY set_key) AS rep FROM d),
       |g AS (SELECT *, (doc_id <> rep) AS is_exact_dup,
       |        (n_tok < $minTok OR ttr < $minTtr) AS bad_quality FROM f),
       |r AS (SELECT *, CASE WHEN NOT is_exact_dup AND NOT bad_quality THEN
       |        row_number() OVER (PARTITION BY lang, (is_exact_dup OR bad_quality)
       |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) END AS cap_rank
       |      FROM g)
       |SELECT doc_id, lang,
       |  CASE WHEN is_exact_dup THEN 'exact_dup'
       |       WHEN bad_quality THEN 'quality'
       |       WHEN cap_rank > $perLangCap THEN 'lang_cap'
       |       ELSE 'kept' END AS stage,
       |  CASE WHEN is_exact_dup THEN rep ELSE -1 END AS evidence,
       |  (CASE WHEN is_exact_dup THEN 'exact_dup'
       |        WHEN bad_quality THEN 'quality'
       |        WHEN cap_rank > $perLangCap THEN 'lang_cap'
       |        ELSE 'kept' END = 'kept') AS kept
       |FROM r ORDER BY doc_id""".stripMargin

  /** DSIR importance-resampling weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every raw-corpus document by how target-domain-like its hashed
    * n-gram distribution is, then keep the top-N. The target domain here
    * is the English slice (`lang = 'en'`); features are word unigrams
    * hashed into `buckets` buckets (the paper's hashed n-gram trick —
    * fixed feature width regardless of vocabulary size, which is what
    * makes the method viable at 100 TB). Per-doc log importance weight:
    *
    *   log w(d) = Σ_tokens [ ln p̂_target(b(tok)) − ln p̂_raw(b(tok)) ]
    *
    * with add-one-smoothed bucket probabilities.
    *
    * Scale shape: one explode → bucket-keyed partial-combine count
    * produces the ENTIRE model (`buckets` rows — broadcast metadata, the
    * paper trains on a sample for the same reason); per-doc weights are
    * a broadcast join + doc-keyed sum (one shuffle at n_tok rows, the
    * same shape as tf-idf); selection is TakeOrdered top-N — no global
    * window, no second corpus pass. Determinism: bucket ids are md5
    * integers (HACKING rule: `conv(md5-prefix,16,10)` ==
    * `CAST('0x'||…)`) and counts are integers; the only libm is the 2·B
    * bucket `ln` calls, each quantized to DECIMAL(30,15) immediately
    * (the `window_distribution` pattern) so the doc-level sum is exact
    * and order-independent; ranking compares exact DECIMALs. */
  def dsirWeights(spark: SparkSession, dir: String, buckets: Int = 64,
                  topN: Int = 50, targetLang: String = "en"): DataFrame = {
    val tok = documents(spark, dir)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("t"))
    val b = tok.select(col("doc_id"), col("lang"),
      (conv(substring(md5(col("t")), 1, 15), 16, 10).cast(LongType) % buckets).as("bkt"))
    val stats = b.groupBy(col("bkt")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("ct"))
    val tot = stats.agg(sum(col("cr")).cast(DoubleType).as("tr"),
      sum(col("ct")).cast(DoubleType).as("tt"))
    val lr = stats.crossJoin(broadcast(tot)).select(col("bkt"),
      (log((col("ct") + 1) / (col("tt") + buckets.toDouble))
        - log((col("cr") + 1) / (col("tr") + buckets.toDouble)))
        .cast(DecimalType(30, 15)).as("lr"))
    val docw = b.join(broadcast(lr), "bkt")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("lr")).as("w"))
      .orderBy(col("w").desc, col("doc_id")).limit(topN)
    docw
      .withColumn("rank", row_number().over(Window.orderBy(col("w").desc, col("doc_id"))))
      .select(col("doc_id"), col("n_tok"),
        round(col("w").cast(DoubleType), 6).as("log_w"), col("rank"))
      .orderBy("rank")
  }

  private def dsirOracle(buckets: Int = 64, topN: Int = 50,
                         targetLang: String = "en"): String =
    s"""WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
       |  FROM documents),
       |b AS (SELECT doc_id, lang,
       |        CAST('0x' || substring(md5(t), 1, 15) AS BIGINT) % $buckets AS bkt
       |      FROM tok),
       |stats AS (SELECT bkt, count(*) AS cr,
       |            count(*) FILTER (WHERE lang = '$targetLang') AS ct
       |          FROM b GROUP BY bkt),
       |tot AS (SELECT CAST(sum(cr) AS DOUBLE) AS tr, CAST(sum(ct) AS DOUBLE) AS tt
       |        FROM stats),
       |lr AS (SELECT bkt, CAST(ln((ct + 1) / (tt + $buckets.0))
       |                      - ln((cr + 1) / (tr + $buckets.0)) AS DECIMAL(30,15)) AS lr
       |       FROM stats, tot),
       |docw AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_tok, sum(l.lr) AS w
       |         FROM b JOIN lr l ON l.bkt = b.bkt GROUP BY b.doc_id)
       |SELECT doc_id, n_tok, ROUND(CAST(w AS DOUBLE), 6) AS log_w,
       |       CAST(rn AS INT) AS rank
       |FROM (SELECT *, row_number() OVER (ORDER BY w DESC, doc_id) AS rn FROM docw)
       |WHERE rn <= $topN ORDER BY rank""".stripMargin

  /** k-anonymity audit over a generalization ladder (Sweeney 2002,
    * "k-Anonymity: a model for protecting privacy") — the
    * privacy-governance check a corpus release runs before publishing
    * per-document metadata: a document is k-anonymous iff at least `k`
    * docs share its quasi-identifier tuple, and when a level fails the
    * release generalizes (suppresses the most-identifying QI column)
    * and re-checks. The QI here is (lang, source, 256-char length
    * bucket); the ladder is the standard suppression chain
    * level 0 = (lang, source, bucket) → 1 = (lang, source) →
    * 2 = (lang) → 3 = (), i.e. exactly a ROLLUP — so the entire lattice
    * audit is ONE pass over the corpus: rollup group sizes, then a
    * metadata-scale re-aggregation per level of how many groups and
    * docs sit below `k`. Output: one row per ladder level with the
    * group count, sub-k group count, docs at risk, and the re-identify
    * risk fraction — the table from which the release picks the minimal
    * generalization with risk 0.
    *
    * Scale shape: rollup = one partial-combined aggregation (4× key
    * expansion map-side, combined before the shuffle); the per-level
    * summary groups the GROUP rows (bounded by the QI cardinality, not
    * the corpus). Determinism: counts are integers; the single risk
    * division is one double op rounded to 6 — IEEE-identical in DuckDB. */
  def kAnonymity(spark: SparkSession, dir: String, k: Int = 5,
                 bucketChars: Int = 256): DataFrame = {
    val groups = documents(spark, dir)
      .select(col("lang"), col("source"),
        expr(s"n_chars div $bucketChars").as("len_bucket"))
      .rollup(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
    groups.groupBy(col("gid"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_small_groups"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("docs_at_risk"),
        sum(col("n")).as("n_docs"))
      .select(
        when(col("gid") === 0, 0).when(col("gid") === 1, 1)
          .when(col("gid") === 3, 2).otherwise(3).as("level"),
        when(col("gid") === 0, "lang,source,len_bucket")
          .when(col("gid") === 1, "lang,source")
          .when(col("gid") === 3, "lang").otherwise("<all>").as("quasi_id"),
        col("n_groups"), col("n_small_groups"), col("docs_at_risk"),
        round(col("docs_at_risk").cast(DoubleType) / col("n_docs"), 6)
          .as("risk_frac"),
        (col("n_small_groups") === 0).as("k_anonymous"))
      .orderBy("level")
  }

  private def kAnonymityOracle(k: Int = 5, bucketChars: Int = 256): String =
    s"""WITH d AS (SELECT lang, source, n_chars // $bucketChars AS len_bucket
       |           FROM documents),
       |g AS (SELECT lang, source, len_bucket, CAST(count(*) AS BIGINT) AS n,
       |        GROUPING(lang, source, len_bucket) AS gid
       |      FROM d GROUP BY ROLLUP (lang, source, len_bucket)),
       |lv AS (SELECT gid, CAST(count(*) AS BIGINT) AS n_groups,
       |         CAST(sum(CASE WHEN n < $k THEN 1 ELSE 0 END) AS BIGINT) AS n_small_groups,
       |         CAST(sum(CASE WHEN n < $k THEN n ELSE 0 END) AS BIGINT) AS docs_at_risk,
       |         CAST(sum(n) AS BIGINT) AS n_docs
       |       FROM g GROUP BY gid)
       |SELECT CASE gid WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 3 THEN 2 ELSE 3 END AS level,
       |  CASE gid WHEN 0 THEN 'lang,source,len_bucket' WHEN 1 THEN 'lang,source'
       |           WHEN 3 THEN 'lang' ELSE '<all>' END AS quasi_id,
       |  n_groups, n_small_groups, docs_at_risk,
       |  ROUND(CAST(docs_at_risk AS DOUBLE) / n_docs, 6) AS risk_frac,
       |  (n_small_groups = 0) AS k_anonymous
       |FROM lv ORDER BY level""".stripMargin

  /** l-diversity audit (Machanavajjhala et al. 2006, "l-Diversity:
    * privacy beyond k-anonymity") — the companion check to
    * [[kAnonymity]]: a k-anonymous release still leaks when every
    * member of an equivalence class shares the same SENSITIVE value
    * (the homogeneity attack). Equivalence classes are the
    * (source, 256-char length bucket) quasi-identifier groups; the
    * sensitive attribute is `lang` (stand-in mechanics — a real release
    * audits its actual sensitive column the same way). Both published
    * instantiations per class: DISTINCT l-diversity (≥ l distinct
    * sensitive values) and ENTROPY l-diversity (H(class) ≥ ln l, with
    * ln 3 pinned to the 6-dp literal 1.098612 so the threshold is an
    * exact constant on both engines). Output: per-source roll-up of
    * failing classes and docs at risk — the table that decides whether
    * the release needs further generalization.
    *
    * Scale shape: two partial-combine aggregations keyed on the QI (+
    * sensitive value), one QI-keyed window for the class totals, one
    * final per-source agg over class rows (bounded by QI cardinality,
    * not the corpus). Determinism: counts are integers; entropy terms
    * are identical doubles DECIMAL-summed (HACKING rule 1) and the
    * class entropy is 6-dp-quantized before the threshold compare. */
  def lDiversity(spark: SparkSession, dir: String, l: Int = 3,
                 bucketChars: Int = 256): DataFrame = {
    val entropyFloor = 1.098612 // ln(3) to 6 dp, exact literal both sides
    val sv = documents(spark, dir)
      .select(col("source"), col("lang"),
        expr(s"n_chars div $bucketChars").as("len_bucket"))
      .groupBy(col("source"), col("len_bucket"), col("lang"))
      .agg(count(lit(1)).as("nsv"))
    val wg = Window.partitionBy(col("source"), col("len_bucket"))
    val cls = sv
      .withColumn("n", sum(col("nsv")).over(wg))
      .withColumn("p", col("nsv").cast(DoubleType) / col("n"))
      .groupBy(col("source"), col("len_bucket"))
      .agg(max(col("n")).as("n"), count(lit(1)).as("n_distinct"),
        round(sum((-col("p") * log(col("p"))).cast(DecimalType(30, 15)))
          .cast(DoubleType), 6).as("h"))
    cls.groupBy(col("source"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n_distinct") < l, 1L).otherwise(0L)).as("n_low_distinct"),
        sum(when(col("h") < entropyFloor, 1L).otherwise(0L)).as("n_low_entropy"),
        sum(when(col("n_distinct") < l || col("h") < entropyFloor, col("n"))
          .otherwise(0L)).as("docs_at_risk"),
        sum(col("n")).as("n_docs"))
      .select(col("source"), col("n_groups"), col("n_low_distinct"),
        col("n_low_entropy"), col("docs_at_risk"),
        round(col("docs_at_risk").cast(DoubleType) / col("n_docs"), 6)
          .as("risk_frac"),
        (col("n_low_distinct") === 0 && col("n_low_entropy") === 0)
          .as("l_diverse"))
      .orderBy("source")
  }

  private def lDiversityOracle(l: Int = 3, bucketChars: Int = 256): String =
    s"""WITH sv AS (SELECT source, n_chars // $bucketChars AS len_bucket, lang,
       |              count(*) AS nsv
       |            FROM documents GROUP BY 1, 2, 3),
       |pn AS (SELECT *, sum(nsv) OVER (PARTITION BY source, len_bucket) AS n
       |       FROM sv),
       |cls AS (SELECT source, len_bucket, CAST(max(n) AS BIGINT) AS n,
       |          CAST(count(*) AS BIGINT) AS n_distinct,
       |          ROUND(CAST(SUM(CAST(-(CAST(nsv AS DOUBLE) / n)
       |            * ln(CAST(nsv AS DOUBLE) / n) AS DECIMAL(30,15))) AS DOUBLE), 6) AS h
       |        FROM pn GROUP BY source, len_bucket),
       |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_groups,
       |  CAST(sum(CASE WHEN n_distinct < $l THEN 1 ELSE 0 END) AS BIGINT) AS n_low_distinct,
       |  CAST(sum(CASE WHEN h < 1.098612 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_entropy,
       |  CAST(sum(CASE WHEN n_distinct < $l OR h < 1.098612 THEN n ELSE 0 END) AS BIGINT)
       |    AS docs_at_risk,
       |  CAST(sum(n) AS BIGINT) AS n_docs
       |FROM cls GROUP BY source)
       |SELECT source, n_groups, n_low_distinct, n_low_entropy, docs_at_risk,
       |  ROUND(CAST(docs_at_risk AS DOUBLE) / n_docs, 6) AS risk_frac,
       |  (n_low_distinct = 0 AND n_low_entropy = 0) AS l_diverse
       |FROM a ORDER BY source""".stripMargin

  /** Contrastive training triplets (anchor, positive, negative) — the
    * pair-construction pass of embedding-model training (SimCSE/DPR
    * family): positive = another member of the anchor's exact-dup group
    * (identical distinct-token set, the [[dedupCanonical]] digest),
    * negative = a deterministically hash-picked non-member.
    *
    * Negative selection must be reproducible AND uniform-ish: every doc
    * gets a dense rank by doc_id (one window); the candidate negative
    * rank is (rank(anchor) + 1 + md5(anchor) % (N-2)) mod N — a fixed
    * pseudo-random stride around the rank ring — resolved back to a doc
    * by an equi-join on rank. The rare candidate that lands inside the
    * anchor's own dup group is FILTERED (both engines replay the same
    * filter) rather than re-probed: re-probing loops are unbounded and
    * the loss of a few triplets is immaterial to training. Scale note:
    * the rank ring is built with the [[graft.ext.DistRank]]
    * decomposition — range-repartition on doc_id, per-partition
    * row_number, broadcast offsets — so no single window ever holds the
    * corpus; the emitted ranks are value-identical to the global
    * row_number the oracle replays. */
  def contrastiveTriplets(spark: SparkSession, dir: String): DataFrame = {
    val t = split(col("text"), " ")
    val base = documents(spark, dir)
      .withColumn("set_key", md5(concat_ws("\u0001", array_sort(array_distinct(t)))))
      .select(col("doc_id"), col("set_key"))
    val ranked = DistRank.withGlobalRank(base, "rn", col("doc_id"))
      .localCheckpoint(true) // consumed three times below (anchors + 2 joins)
    val n = ranked.count()
    // the stride is h % (n-2): at n <= 2 Spark's modulo-by-zero yields
    // null (triplets silently vanish) while DuckDB's % 0 errors — make
    // the degenerate corpus loud and identical on both engines
    require(n >= 3, s"contrastiveTriplets needs >= 3 documents, got $n")
    val gw = Window.partitionBy(col("set_key"))
    // positive: the smallest OTHER member of the anchor's dup group
    val anchors = ranked
      .withColumn("n_members", count(lit(1)).over(gw))
      .withColumn("gmin", min(col("doc_id")).over(gw))
      .withColumn("gmin2", min(when(col("doc_id") =!= col("gmin"), col("doc_id"))).over(gw))
      .filter(col("n_members") >= 2)
      .withColumn("pos_id", when(col("doc_id") === col("gmin"), col("gmin2"))
        .otherwise(col("gmin")))
    val h = conv(substring(md5(col("doc_id").cast(StringType)), 1, 15), 16, 10)
      .cast(LongType)
    val cand = anchors
      .withColumn("neg_rn", (col("rn") + lit(1L) + h % (n - 2)) % n)
    cand
      .join(ranked.select(col("rn").as("neg_rn"), col("doc_id").as("neg_id"),
        col("set_key").as("neg_key")), "neg_rn")
      .filter(col("neg_key") =!= col("set_key"))
      .select(col("doc_id").as("anchor_id"), col("pos_id"), col("neg_id"),
        col("n_members").as("group_size"))
      .orderBy("anchor_id")
  }

  private val contrastiveTripletsOracle: String =
    """WITH d AS (SELECT doc_id,
      |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), chr(1))) AS set_key
      |  FROM documents),
      |r AS (SELECT doc_id, set_key,
      |        row_number() OVER (ORDER BY doc_id) - 1 AS rn FROM d),
      |nn AS (SELECT count(*) AS n FROM r),
      |a0 AS (SELECT *, count(*) OVER (PARTITION BY set_key) AS n_members,
      |         min(doc_id) OVER (PARTITION BY set_key) AS gmin FROM r),
      |a AS (SELECT *, min(CASE WHEN doc_id <> gmin THEN doc_id END)
      |        OVER (PARTITION BY set_key) AS gmin2 FROM a0),
      |an AS (SELECT doc_id, set_key, rn, n_members,
      |         CASE WHEN doc_id = gmin THEN gmin2 ELSE gmin END AS pos_id
      |       FROM a WHERE n_members >= 2),
      |c AS (SELECT an.*, (rn + 1 + CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15) AS BIGINT)
      |                     % ((SELECT n FROM nn) - 2)) % (SELECT n FROM nn) AS neg_rn
      |      FROM an)
      |SELECT c.doc_id AS anchor_id, c.pos_id, r2.doc_id AS neg_id,
      |       CAST(c.n_members AS BIGINT) AS group_size
      |FROM c JOIN r r2 ON r2.rn = c.neg_rn
      |WHERE r2.set_key <> c.set_key
      |ORDER BY anchor_id""".stripMargin

  /** DPO/RLHF preference-PAIR construction (Rafailov et al. 2023's input
    * shape): within each group (language here; prompt-id in a production
    * preference set) pair the k best-scored documents with the k worst,
    * best-vs-worst by rank, emitting (chosen, rejected, margin) training
    * rows. Complements [[StatsOps.preferenceBtFit]]: BT FITS a reward
    * from given pairs; this CONSTRUCTS the pairs from a score.
    *
    * Determinism: score is the exact per-row ttr ratio; top order
    * (score DESC, doc_id) and bottom order are exact reverses, so with
    * group size ≥ 2k the chosen/rejected sets are provably disjoint.
    * Scale shape: two rank windows partitioned by the group key (no
    * global window) and one (group, rank) equi-join on the 2k-row
    * survivors; at 100 TB per-group top-k upgrades to the same
    * quantile-cutoff trick as the budget selectors, margins unchanged. */
  def dpoPairs(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val t = split(col("text"), " ")
    val d = documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        (size(array_distinct(t)).cast(DoubleType) / size(t)).as("score"))
    val wTop = Window.partitionBy(col("lang")).orderBy(col("score").desc, col("doc_id"))
    val wBot = Window.partitionBy(col("lang")).orderBy(col("score").asc, col("doc_id").desc)
    val ranked = d
      .withColumn("n_lang", count(lit(1)).over(Window.partitionBy(col("lang"))))
      .withColumn("top_rank", row_number().over(wTop))
      .withColumn("bot_rank", row_number().over(wBot))
      .filter(col("n_lang") >= 2 * k)
    val chosen = ranked.filter(col("top_rank") <= k)
      .select(col("lang"), col("top_rank").as("pair_rank"),
        col("doc_id").as("chosen_id"), col("score").as("cs"))
    val rejected = ranked.filter(col("bot_rank") <= k)
      .select(col("lang"), col("bot_rank").as("pair_rank"),
        col("doc_id").as("rejected_id"), col("score").as("rs"))
    chosen.join(rejected, Seq("lang", "pair_rank"))
      .select(col("lang"), col("pair_rank"), col("chosen_id"), col("rejected_id"),
        round(col("cs"), 6).as("chosen_score"),
        round(col("rs"), 6).as("rejected_score"),
        round(col("cs") - col("rs"), 6).as("margin"))
      .orderBy("lang", "pair_rank")
  }

  private def dpoPairsOracle(k: Int = 8): String =
    s"""WITH d AS (SELECT doc_id, lang,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS score
       |  FROM documents),
       |r AS (SELECT *, count(*) OVER (PARTITION BY lang) AS n_lang,
       |        row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS top_rank,
       |        row_number() OVER (PARTITION BY lang ORDER BY score ASC, doc_id DESC) AS bot_rank
       |      FROM d)
       |SELECT c.lang, CAST(c.top_rank AS INT) AS pair_rank,
       |  c.doc_id AS chosen_id, j.doc_id AS rejected_id,
       |  ROUND(c.score, 6) AS chosen_score, ROUND(j.score, 6) AS rejected_score,
       |  ROUND(c.score - j.score, 6) AS margin
       |FROM r c JOIN r j ON j.lang = c.lang AND j.bot_rank = c.top_rank
       |WHERE c.n_lang >= ${2 * k} AND c.top_rank <= $k
       |ORDER BY c.lang, pair_rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dpo_pairs" -> ((s, d) => dpoPairs(s, d)),
    "contrastive_triplets" -> ((s, d) => contrastiveTriplets(s, d)),
    // minTok=15 / cap=150 keep all four verdict stages live on the
    // fixtures (19 quality drops, en over-budget by ~36)
    "curation_audit" -> ((s: SparkSession, d: String) =>
      curationAudit(s, d, minTok = 15, perLangCap = 150)),
    "corpus_release" -> ((s: SparkSession, d: String) => corpusRelease(s, d)),
    "corpus_datasheet" -> ((s: SparkSession, d: String) => corpusDatasheet(s, d)),
    "split_leakage" -> ((s: SparkSession, d: String) => splitLeakage(s, d)),
    "lang_temperature" -> ((s: SparkSession, d: String) => langTemperature(s, d)),
    "weighted_sample" -> ((s: SparkSession, d: String) => weightedSample(s, d)),
    "dedup_canonical" -> ((s: SparkSession, d: String) => dedupCanonical(s, d)),
    "token_budget_select" -> ((s: SparkSession, d: String) => tokenBudgetSelect(s, d)),
    "dsir_weights" -> ((s: SparkSession, d: String) => dsirWeights(s, d)),
    "k_anonymity" -> ((s: SparkSession, d: String) => kAnonymity(s, d)),
    "l_diversity" -> ((s: SparkSession, d: String) => lDiversity(s, d))
  )

  val oracles: Map[String, String] = Map(
    "dpo_pairs" -> dpoPairsOracle(),
    "contrastive_triplets" -> contrastiveTripletsOracle,
    "curation_audit" -> curationAuditOracle(minTok = 15, perLangCap = 150),
    "corpus_release" -> corpusReleaseOracle,
    "corpus_datasheet" -> corpusDatasheetOracle,
    "split_leakage" -> splitLeakageOracle,
    "lang_temperature" -> langTemperatureOracle,
    "weighted_sample" -> weightedSampleOracle(),
    "dedup_canonical" -> dedupCanonicalOracle,
    "token_budget_select" -> tokenBudgetOracle(),
    "dsir_weights" -> dsirOracle(),
    "k_anonymity" -> kAnonymityOracle(),
    "l_diversity" -> lDiversityOracle()
  )
}
