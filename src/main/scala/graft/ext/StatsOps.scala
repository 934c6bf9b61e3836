package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Tables._

/** Corpus-statistics and data-profiling operators: the measurement side
  * of a training-data pipeline — frequency sketches, power-law fits,
  * per-epoch training order, entropy quality signals, and ANALYZE-style
  * column profiles. Everything is codegen'd built-ins (no UDFs), every
  * aggregation is map-side partial-combined, and every transcendental
  * follows the HACKING.md libm rule: `ln`/`log2` outputs are rounded to
  * 6 dp BEFORE any distributed aggregation and all sums run through
  * DECIMAL(30,15) so the result is partition-order-independent and
  * bit-comparable with the DuckDB oracle.
  */
object StatsOps {

  private val toks: Column = split(col("text"), " ")

  private def decSum(c: Column): Column =
    sum(c.cast(DecimalType(30, 15))).cast(DoubleType)

  /** 60-bit integer from the first 15 hex digits of md5(s) — the
    * engine-portable hash used across the md5-construction family
    * (TextOps.md5DigitTokens is the worked precedent). */
  private def md5Long60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  private def md5Long60Sql(expr: String): String =
    s"CAST('0x' || substring(md5($expr), 1, 15) AS BIGINT)"

  // ---- cms_freq: Count–Min sketch (Cormode & Muthukrishnan 2005) ------

  /** Count–Min frequency sketch over the token stream: `depth` rows of
    * `width` counters, row j hashing token t to bucket
    * md5₆₀(t ⧺ "#j") mod width; the point estimate is the MIN over the
    * depth counters and NEVER underestimates the true count (each
    * counter ≥ true count since collisions only add). The query builds
    * the 256-cell counter table, then reports estimate vs exact truth
    * for the top-`topK` tokens.
    *
    * Scale shape: counters aggregate to depth×width = 256 cells through
    * map-side partial combine — the shuffle carries ≤256 rows per input
    * partition regardless of corpus size, which is the entire point of
    * the sketch (a full exact group-by shuffles every distinct token).
    * The exact-truth side here exists to GRADE the sketch and to pick
    * the probe set; a production 100 TB run would keep only the counter
    * pass (one shuffle of sketch-state) and probe ad hoc. Determinism:
    * counters are exact integer counts under fixed hashes, so estimate
    * and overcount are integers — no tolerance, plain hash compare. */
  def cmsFreq(spark: SparkSession, dir: String, depth: Int = 4,
              width: Int = 64, topK: Int = 20): DataFrame = {
    val tok = documents(spark, dir).select(explode(toks).as("tok"))
    def buckets(c: Column): Column = array((0 until depth).map { j =>
      pmod(md5Long60(concat(c, lit(s"#$j"))), lit(width.toLong))
    }: _*)
    val counters = tok
      .select(posexplode(buckets(col("tok"))).as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("c"))
    val truth = tok.groupBy(col("tok")).agg(count(lit(1)).as("true_cnt"))
    // top-k via TakeOrdered (distributed); the rank window then runs on
    // a bounded topK-row relation, not the full vocabulary
    val top = truth.orderBy(col("true_cnt").desc, col("tok")).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("true_cnt").desc, col("tok"))))
    top
      .select(col("rank"), col("tok"), col("true_cnt"),
        posexplode(buckets(col("tok"))).as(Seq("j", "bucket")))
      .join(counters, Seq("j", "bucket"))
      .groupBy(col("rank"), col("tok"), col("true_cnt"))
      .agg(min(col("c")).as("cms_est"))
      .select(col("rank"), col("tok"), col("true_cnt"), col("cms_est"),
        (col("cms_est") - col("true_cnt")).as("overcount"))
      .orderBy("rank")
  }

  private def cmsFreqOracle(depth: Int = 4, width: Int = 64,
                            topK: Int = 20): String = {
    def bucketList(expr: String) = (0 until depth)
      .map(j => s"${md5Long60Sql(s"$expr || '#$j'")} % $width")
      .mkString("[", ", ", "]")
    s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |bl AS (SELECT tok, ${bucketList("tok")} AS bl FROM tok),
       |cells AS (SELECT CAST(generate_subscripts(bl, 1) - 1 AS INT) AS j,
       |            unnest(bl) AS bucket FROM bl),
       |counters AS (SELECT j, bucket, count(*) AS c FROM cells GROUP BY 1, 2),
       |truth AS (SELECT tok, count(*) AS true_cnt FROM tok GROUP BY 1),
       |top AS (SELECT tok, true_cnt,
       |          CAST(row_number() OVER (ORDER BY true_cnt DESC, tok) AS INT) AS rank
       |        FROM truth ORDER BY true_cnt DESC, tok LIMIT $topK),
       |probes AS (SELECT rank, tok, true_cnt,
       |             CAST(generate_subscripts(bl, 1) - 1 AS INT) AS j,
       |             unnest(bl) AS bucket
       |           FROM (SELECT rank, tok, true_cnt, ${bucketList("tok")} AS bl FROM top)),
       |est AS (SELECT rank, tok, true_cnt, min(c) AS cms_est
       |        FROM probes JOIN counters USING (j, bucket) GROUP BY 1, 2, 3)
       |SELECT rank, tok, true_cnt, cms_est, cms_est - true_cnt AS overcount
       |FROM est ORDER BY rank""".stripMargin
  }

  // ---- zipf_fit: Zipf-law exponent by log–log OLS ---------------------

  /** Zipf-law fit over the top-`topR` token frequencies: OLS of
    * ln(count) on ln(rank) gives the power-law exponent (slope ≈ −s for
    * count ∝ rank^(−s)) — the corpus-health check that pairs with
    * [[CorpusOps.vocabGrowth]]'s Heaps law. Natural-language corpora sit
    * near slope −1; a corpus of boilerplate or template spam flattens.
    *
    * Scale shape: token counts partial-combine map-side; the rank
    * window runs on a TakeOrdered-bounded topR-row relation, never the
    * full vocabulary. Determinism: per the HACKING.md libm rule the two
    * `ln` outputs are rounded to 6 dp BEFORE aggregation, all OLS sums
    * are DECIMAL, and slope/intercept round at display. */
  def zipfFit(spark: SparkSession, dir: String, topR: Int = 256): DataFrame = {
    val truth = documents(spark, dir).select(explode(toks).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val ranked = truth.orderBy(col("cnt").desc, col("tok")).limit(topR)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cnt").desc, col("tok"))))
    val pts = ranked.select(
      round(log(col("rk")), 6).as("x"), round(log(col("cnt")), 6).as("y"))
    pts.agg(count(lit(1)).as("n"), decSum(col("x")).as("sx"),
        decSum(col("y")).as("sy"), decSum(col("x") * col("y")).as("sxy"),
        decSum(col("x") * col("x")).as("sxx"))
      .select(col("n").cast(IntegerType).as("n_pts"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
          col("n"), 6).as("intercept"))
  }

  private def zipfFitOracle(topR: Int = 256): String =
    s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |truth AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1),
       |ranked AS (SELECT cnt,
       |             row_number() OVER (ORDER BY cnt DESC, tok) AS rk
       |           FROM truth ORDER BY cnt DESC, tok LIMIT $topR),
       |pts AS (SELECT ROUND(ln(rk), 6) AS x, ROUND(ln(cnt), 6) AS y FROM ranked),
       |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |        CAST(SUM(CAST(x AS DECIMAL(30,15))) AS DOUBLE) AS sx,
       |        CAST(SUM(CAST(y AS DECIMAL(30,15))) AS DOUBLE) AS sy,
       |        CAST(SUM(CAST(x * y AS DECIMAL(30,15))) AS DOUBLE) AS sxy,
       |        CAST(SUM(CAST(x * x AS DECIMAL(30,15))) AS DOUBLE) AS sxx
       |      FROM pts)
       |SELECT CAST(n AS INT) AS n_pts,
       |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       |  ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
       |    AS intercept
       |FROM s""".stripMargin

  // ---- epoch_shuffle: deterministic per-epoch training order ----------

  /** The global-shuffle primitive of a training pipeline: each epoch
    * gets its own deterministic pseudorandom permutation of the corpus,
    * sharded for parallel readers. Doc d in epoch e sorts by
    * md5(d ⧺ ":" ⧺ e); its shard is that key's 60-bit value mod
    * `shards` and its position is the rank within the shard.
    *
    * Scale shape: key and shard derive map-side; the only movement is
    * ONE shuffle keyed by (epoch, shard) and a within-shard sort —
    * exactly how a 100 TB shuffle-and-shard materialization runs, with
    * shards sized to reader parallelism. No global sort, no driver
    * state; a new epoch is a new literal, not a new design. Determinism:
    * md5 keys are engine-portable strings; ties cannot happen (doc_id
    * is unique per epoch) but doc_id tiebreaks anyway. */
  def epochShuffle(spark: SparkSession, dir: String, epochs: Int = 2,
                   shards: Int = 16): DataFrame = {
    val d = documents(spark, dir).select(col("doc_id"),
      explode(array((0 until epochs).map(lit): _*)).as("epoch"))
    val keyed = d.withColumn("k",
        md5(concat(col("doc_id").cast(StringType), lit(":"),
          col("epoch").cast(StringType))))
      .withColumn("shard",
        pmod(conv(substring(col("k"), 1, 15), 16, 10).cast(LongType),
          lit(shards.toLong)).cast(IntegerType))
    keyed.withColumn("pos", row_number().over(
        Window.partitionBy(col("epoch"), col("shard"))
          .orderBy(col("k"), col("doc_id"))))
      .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
      .orderBy("epoch", "shard", "pos")
  }

  private def epochShuffleOracle(epochs: Int = 2, shards: Int = 16): String =
    s"""WITH d AS (SELECT doc_id, unnest(generate_series(0, ${epochs - 1})) AS epoch
       |           FROM documents),
       |k0 AS (SELECT doc_id, CAST(epoch AS INT) AS epoch,
       |         md5(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)) AS k
       |       FROM d),
       |keyed AS (SELECT doc_id, epoch, k,
       |            CAST(CAST('0x' || substring(k, 1, 15) AS BIGINT)
       |                 % $shards AS INT) AS shard
       |          FROM k0)
       |SELECT epoch, shard,
       |  CAST(row_number() OVER (PARTITION BY epoch, shard ORDER BY k, doc_id) AS INT) AS pos,
       |  doc_id
       |FROM keyed ORDER BY epoch, shard, pos""".stripMargin

  // ---- char_entropy: order-0 entropy quality signal -------------------

  /** Per-document order-0 (character-unigram) Shannon entropy — the
    * compression-flavored quality signal: template spam and repeated
    * boilerplate score low, natural prose high. Uses the identity
    * H = log₂(n) − (1/n)·Σ cᵢ·log₂(cᵢ) over character counts cᵢ so the
    * corpus statistics stay INTEGER until one log per distinct
    * character.
    *
    * Scale shape: (doc, char) counts partial-combine map-side (alphabet
    * ≪ text length), then one doc-keyed reduce; nothing global.
    * Determinism: the HACKING.md libm rule — each cᵢ·log₂(cᵢ) term
    * rounds to 6 dp before the DECIMAL sum, entropy rounds at display. */
  def charEntropy(spark: SparkSession, dir: String): DataFrame = {
    val cc = documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
    cc.groupBy(col("doc_id")).agg(
        sum(col("c")).as("n_ch"),
        count(lit(1)).as("n_distinct_ch"),
        decSum(round(col("c") * log2(col("c")), 6)).as("st"))
      .select(col("doc_id"), col("n_ch"), col("n_distinct_ch"),
        round(log2(col("n_ch")) - col("st") / col("n_ch"), 4).as("entropy_bits"))
      .orderBy("doc_id")
  }

  private def charEntropyOracle: String =
    """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
      |            FROM documents),
      |cc AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
      |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_ch,
      |          CAST(count(*) AS BIGINT) AS n_distinct_ch,
      |          CAST(SUM(CAST(ROUND(c * log2(c), 6) AS DECIMAL(30,15))) AS DOUBLE) AS st
      |        FROM cc GROUP BY 1)
      |SELECT doc_id, n_ch, n_distinct_ch,
      |  ROUND(log2(n_ch) - st / n_ch, 4) AS entropy_bits
      |FROM agg ORDER BY doc_id""".stripMargin

  // ---- profile_stats: ANALYZE-style column profiler -------------------

  /** ANALYZE-TABLE-style per-column profile of `orders`: row count, null
    * count, exact NDV, and min/max rendered through a type-stable
    * representation (integers as decimal strings, doubles through
    * DECIMAL(18,2), timestamps as ISO seconds) so every column's profile
    * lands in one uniform relation.
    *
    * Scale shape: one single-row aggregate PER COLUMN over a
    * column-pruned parquet scan (union of 6 tiny aggs) — each pass reads
    * exactly one column's pages and partial-combines map-side. That is
    * the shape ANALYZE runs at warehouse scale; the exact
    * count(DISTINCT) here would become a sketched NDV (HLL, already in
    * [[graft.functions]]'s family) at 100 TB, traded per-column when
    * exactness stops paying for its shuffle. */
  def profileStats(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    def prof(name: String, repr: Column => Column): DataFrame =
      o.agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(name))).as("n_nulls"),
          countDistinct(col(name)).as("ndv"),
          repr(min(col(name))).as("min_repr"),
          repr(max(col(name))).as("max_repr"))
        .select(lit(name).as("col_name"), col("n_rows"), col("n_nulls"),
          col("ndv"), col("min_repr"), col("max_repr"))
    val asStr = (c: Column) => c.cast(StringType)
    val asDec2 = (c: Column) => round(c, 2).cast(DecimalType(18, 2)).cast(StringType)
    val asIso = (c: Column) => date_format(c, "yyyy-MM-dd HH:mm:ss")
    prof("o_orderkey", asStr)
      .unionAll(prof("o_custkey", asStr))
      .unionAll(prof("o_orderstatus", asStr))
      .unionAll(prof("o_totalprice", asDec2))
      .unionAll(prof("o_orderdate", asIso))
      .unionAll(prof("o_orderpriority", asStr))
      .orderBy("col_name")
  }

  private def profileStatsOracle: String = {
    def prof(name: String, repr: String => String): String =
      s"""SELECT '$name' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(*) - count($name) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $name) AS BIGINT) AS ndv,
         |  ${repr(s"min($name)")} AS min_repr,
         |  ${repr(s"max($name)")} AS max_repr
         |FROM orders""".stripMargin
    val asStr = (e: String) => s"CAST($e AS VARCHAR)"
    val asDec2 = (e: String) => s"CAST(CAST(ROUND($e, 2) AS DECIMAL(18,2)) AS VARCHAR)"
    val asIso = (e: String) => s"strftime($e, '%Y-%m-%d %H:%M:%S')"
    Seq(prof("o_orderkey", asStr), prof("o_custkey", asStr),
      prof("o_orderstatus", asStr), prof("o_totalprice", asDec2),
      prof("o_orderdate", asIso), prof("o_orderpriority", asStr))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Word dispersion across sources — Gries' deviation of proportions
    * (DP, Gries 2008), the corpus-linguistics answer to "is this word
    * used EVERYWHERE or only by one source?": for word w,
    * `DP(w) = ½ · Σ_s |share of w's occurrences in s − s's share of the
    * corpus|` ∈ [0, 1); near 0 = spread exactly like the corpus, near
    * 1 = concentrated in one source. A curation pipeline reads high-DP
    * frequent words as domain markers (or scraper artifacts) before
    * trusting frequency-based vocab/quality decisions.
    *
    * Scale shape: one (source, token) count agg (map-side combined),
    * one k-row source-mass agg broadcast onto it, one token-keyed
    * reduce for the |·| sum. Every ratio is exact division; the DP sum
    * crosses partitions as DECIMAL over 9-dp-pinned terms (the
    * double→DECIMAL 15th-digit rule). Top-`n` by DP then token. */
  def wordDispersion(spark: SparkSession, dir: String, n: Int = 50,
                     minCount: Int = 30): DataFrame = {
    val tok = documents(spark, dir)
      .select(col("source"), explode(toks).as("token"))
    val st = tok.groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // feeds token totals, source masses, DP terms
    val tokTot = st.groupBy(col("token")).agg(sum(col("c")).as("ct"))
    val srcMass = st.groupBy(col("source")).agg(sum(col("c")).as("cs"))
      .crossJoin(broadcast(st.agg(sum(col("c")).as("call"))))
      .select(col("source"), (col("cs").cast(DoubleType) / col("call")).as("p_s"))
    // |s_i − p_i| needs a row per (token, source) INCLUDING sources where
    // the word never occurs (s_i = 0 there): that residual mass equals
    // Σ_{s: c=0} p_s = 1 − Σ_{s: c>0} p_s, folded in without the explode
    val terms = st.join(broadcast(srcMass), "source")
      .join(tokTot, "token")
      .withColumn("s_i", col("c").cast(DoubleType) / col("ct"))
      .groupBy(col("token"), col("ct"))
      .agg(
        sum(round(abs(col("s_i") - col("p_s")), 9).cast(DecimalType(30, 15)))
          .cast(DoubleType).as("present_sum"),
        sum(round(col("p_s"), 9).cast(DecimalType(30, 15)))
          .cast(DoubleType).as("present_mass"))
      .withColumn("dp", round((col("present_sum") + (lit(1.0) - col("present_mass"))) / 2.0, 6))
    terms.filter(col("ct") >= minCount)
      .select(col("token"), col("ct").as("n_occurrences"), col("dp"))
      .orderBy(col("dp").desc, col("token"))
      .limit(n)
  }

  private def wordDispersionOracle(n: Int = 50, minCount: Int = 30): String =
    s"""WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
       |st AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
       |tt AS (SELECT token, SUM(c) AS ct FROM st GROUP BY 1),
       |sm AS (SELECT source, CAST(SUM(c) AS DOUBLE) / (SELECT SUM(c) FROM st) AS p_s
       |       FROM st GROUP BY 1),
       |terms AS (SELECT st.token, tt.ct,
       |    CAST(SUM(CAST(ROUND(abs(CAST(st.c AS DOUBLE) / tt.ct - sm.p_s), 9) AS DECIMAL(30,15))) AS DOUBLE) AS present_sum,
       |    CAST(SUM(CAST(ROUND(sm.p_s, 9) AS DECIMAL(30,15))) AS DOUBLE) AS present_mass
       |  FROM st JOIN sm USING (source) JOIN tt USING (token)
       |  GROUP BY 1, 2)
       |SELECT token, CAST(ct AS BIGINT) AS n_occurrences,
       |  ROUND((present_sum + (1.0 - present_mass)) / 2.0, 6) AS dp
       |FROM terms WHERE ct >= $minCount
       |ORDER BY dp DESC, token LIMIT $n""".stripMargin

  /** Bradley-Terry preference-strength fit across language slices — the
    * pairwise-preference model a reward-model data pipeline runs over
    * human/synthetic comparisons (Bradley & Terry 1952; the MM fixed
    * point is Zermelo 1929, convergence Hunter 2004). Here every
    * cross-lang document pair is an implicit comparison judged by a
    * deterministic quality proxy (type-token ratio), so the fit ranks
    * languages by how often their documents win quality comparisons.
    *
    * Scale shape — the quadratic pair space is never materialized:
    *  1. histogram: one (lang, score) groupBy (map-side combined);
    *  2. win counts from ORDER STATISTICS: a window over DISTINCT
    *     scores (not docs) accumulates per-lang cumulative counts;
    *     wins_ab = Σ_s h_a(s)·cum_b(<s), ties from the same histogram —
    *     O(distinct scores), one tiny window;
    *  3. MM iterations θ'_a = W_a / Σ_b n_ab/(θ_a+θ_b) on the k×k
    *     matrix — k=|langs| rows collect at metadata scale (the
    *     kmeansTrace precedent), re-injected as map literals.
    * Division/addition only (libm-free, HACKING rule 8); every sum that
    * crosses partitions is DECIMAL(30,15); wins/ties are integer-exact
    * and W_ab = wins + ties/2 is a sum of exact halves. The oracle
    * replays the SAME two MM iterations from a naive histogram join. */
  def preferenceBtFit(spark: SparkSession, dir: String, iters: Int = 2): DataFrame = {
    val d0 = documents(spark, dir).select(col("lang"),
      (size(array_distinct(toks)).cast(DoubleType) / size(toks)).as("score"))
    val langs = d0.select("lang").distinct().orderBy("lang")
      .collect().map(_.getString(0)).toSeq
    val histCols = langs.map(l => sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"h_$l"))
    val hist = d0.groupBy(col("score")).agg(histCols.head, histCols.tail: _*)
    // cumulative strictly-below counts per lang: RANGE cum minus the
    // current score's own bucket (scores are distinct rows here, so the
    // window is over |distinct scores| rows — tiny relative to docs)
    val wCum = Window.orderBy("score")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.select(col("score") +:
      langs.flatMap(l => Seq(col(s"h_$l"),
        (sum(col(s"h_$l")).over(wCum) - col(s"h_$l")).as(s"below_$l"))): _*)
    // wins_ab = Σ_s h_a(s) · below_b(s); ties_ab = Σ_s h_a(s) · h_b(s)
    val pairCols = (for { a <- langs; b <- langs if a != b } yield
      struct(lit(a).as("la"), lit(b).as("lb"),
        sum(col(s"h_$a") * col(s"below_$b")).as("wins"),
        sum(col(s"h_$a") * col(s"h_$b")).as("ties"))).toIndexedSeq
    val matDf = cum
      .agg(pairCols.head.as("c0"),
        pairCols.tail.zipWithIndex.map { case (c, i) => c.as(s"c${i + 1}") }: _*)
      .select(explode(array(pairCols.indices.map(i => col(s"c$i")): _*)).as("p"))
      .select(col("p.la"), col("p.lb"), col("p.wins"), col("p.ties"))
      .withColumn("w_ab", col("wins").cast(DoubleType) + col("ties").cast(DoubleType) / 2.0)
    val counts = d0.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMap = map(langs.flatMap(l => Seq(lit(l), lit(counts(l).toDouble))): _*)
    val withN = matDf
      .withColumn("n_ab", element_at(nMap, col("la")) * element_at(nMap, col("lb")))
      .localCheckpoint(true) // consumed once per MM iteration
    // MM fixed point, `iters` rounds from θ = 1, arithmetic-mean
    // normalized (mean, not geometric: no pow — libm-free)
    var theta: Map[String, Double] = langs.map(_ -> 1.0).toMap
    val thetas = scala.collection.mutable.ArrayBuffer.empty[Map[String, Double]]
    for (_ <- 1 to iters) {
      val tMap = map(langs.flatMap(l => Seq(lit(l), lit(theta(l)))): _*)
      // every quotient is rounded to 9 dp BEFORE its DECIMAL aggregation:
      // the two engines' double→DECIMAL(30,15) casts can disagree by one
      // unit in the 15th fractional digit on full-precision quotients
      // (shortest-string vs exact-expansion conversion; observed once in
      // this very query) — a 9-dp value's expansion is unambiguous there.
      // Same discipline as the libm-output rounding rule (HACKING rule 8).
      val it = withN
        .withColumn("term", round(col("n_ab") /
          (element_at(tMap, col("la")) + element_at(tMap, col("lb"))), 9))
        .groupBy(col("la"))
        .agg(decSum(col("term")).as("denom"), sum(col("w_ab")).as("w_tot"))
        .withColumn("t_raw", round(col("w_tot") / col("denom"), 9))
      // normalization mean through the ENGINE's double→DECIMAL cast (the
      // oracle's exact construction) — never a driver-side replica of the
      // cast semantics. k collected rows per iteration: metadata scale.
      val normed = it
        .withColumn("mean",
          sum(col("t_raw").cast(DecimalType(30, 15)))
            .over(Window.partitionBy(lit(1))).cast(DoubleType) / langs.size)
        .select(col("la"), round(col("t_raw") / col("mean"), 9).as("t"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      theta = normed
      thetas += theta
    }
    val outCols = (1 to iters).map(i =>
      element_at(map(langs.flatMap(l => Seq(lit(l), lit(thetas(i - 1)(l)))): _*),
        col("lang")).as(s"theta_$i"))
    d0.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .select(col("lang") +: col("n_docs") +: outCols: _*)
      .orderBy("lang")
  }

  private def preferenceBtFitOracle(iters: Int = 2): String = {
    require(iters == 2, "oracle is unrolled for exactly 2 MM iterations")
    """WITH d0 AS (SELECT lang,
      |    CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
      |      / len(string_split(text,' ')) AS score FROM documents),
      |hist AS (SELECT lang, score, count(*) AS c FROM d0 GROUP BY 1, 2),
      |nl AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM d0 GROUP BY 1),
      |k AS (SELECT count(*) AS k FROM nl),
      |mat AS (SELECT a.lang AS la, b.lang AS lb,
      |          SUM(CASE WHEN a.score > b.score THEN a.c * b.c ELSE 0 END) AS wins,
      |          SUM(CASE WHEN a.score = b.score THEN a.c * b.c ELSE 0 END) AS ties
      |        FROM hist a JOIN hist b ON a.lang <> b.lang GROUP BY 1, 2),
      |m AS (SELECT la, lb,
      |        CAST(wins AS DOUBLE) + CAST(ties AS DOUBLE) / 2.0 AS w_ab,
      |        (SELECT n FROM nl WHERE lang = la) * (SELECT n FROM nl WHERE lang = lb) AS n_ab
      |      FROM mat),
      |i1 AS (SELECT la,
      |         CAST(SUM(CAST(round(n_ab / (1.0 + 1.0), 9) AS DECIMAL(30,15))) AS DOUBLE) AS denom,
      |         SUM(w_ab) AS w_tot
      |       FROM m GROUP BY la),
      |r1 AS (SELECT la, round(w_tot / denom, 9) AS t_raw FROM i1),
      |m1 AS (SELECT CAST(SUM(CAST(t_raw AS DECIMAL(30,15))) AS DOUBLE)
      |               / (SELECT k FROM k) AS mean FROM r1),
      |t1 AS (SELECT la, round(t_raw / (SELECT mean FROM m1), 9) AS t FROM r1),
      |i2 AS (SELECT m.la,
      |         CAST(SUM(CAST(round(n_ab / (ta.t + tb.t), 9) AS DECIMAL(30,15))) AS DOUBLE) AS denom,
      |         SUM(w_ab) AS w_tot
      |       FROM m JOIN t1 ta ON ta.la = m.la JOIN t1 tb ON tb.la = m.lb
      |       GROUP BY m.la),
      |r2 AS (SELECT la, round(w_tot / denom, 9) AS t_raw FROM i2),
      |m2 AS (SELECT CAST(SUM(CAST(t_raw AS DECIMAL(30,15))) AS DOUBLE)
      |               / (SELECT k FROM k) AS mean FROM r2),
      |t2 AS (SELECT la, round(t_raw / (SELECT mean FROM m2), 9) AS t FROM r2)
      |SELECT nl.lang, CAST(nl.n AS BIGINT) AS n_docs,
      |       t1.t AS theta_1, t2.t AS theta_2
      |FROM nl JOIN t1 ON t1.la = nl.lang JOIN t2 ON t2.la = nl.lang
      |ORDER BY nl.lang""".stripMargin
  }

  // ---- driver wiring --------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cms_freq" -> ((s: SparkSession, d: String) => cmsFreq(s, d)),
    "zipf_fit" -> ((s: SparkSession, d: String) => zipfFit(s, d)),
    "epoch_shuffle" -> ((s: SparkSession, d: String) => epochShuffle(s, d)),
    "char_entropy" -> ((s: SparkSession, d: String) => charEntropy(s, d)),
    "profile_stats" -> ((s: SparkSession, d: String) => profileStats(s, d)),
    "preference_bt_fit" -> ((s: SparkSession, d: String) => preferenceBtFit(s, d)),
    "word_dispersion" -> ((s: SparkSession, d: String) => wordDispersion(s, d)))

  val oracles: Map[String, String] = Map(
    "cms_freq" -> cmsFreqOracle(),
    "zipf_fit" -> zipfFitOracle(),
    "epoch_shuffle" -> epochShuffleOracle(),
    "char_entropy" -> charEntropyOracle,
    "profile_stats" -> profileStatsOracle,
    "preference_bt_fit" -> preferenceBtFitOracle(),
    "word_dispersion" -> wordDispersionOracle())
}
