package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.ops.Tables._

/** Edit-distance similarity join via PassJoin partition blocking
  * (Li, Deng, Feng: "PASS-JOIN: a partition-based method for similarity
  * joins", PVLDB 2011). The scale path the LSH families can't give:
  * LSH bounds SET similarity (Jaccard/cosine) but is blind to ORDER —
  * token-sequence edits (a swapped clause, a dropped sentence) need an
  * edit-distance join, and the naive one is O(n²·len²).
  *
  * PassJoin's pigeonhole blocking: partition each indexed string into
  * d+1 segments — at most d edits can touch at most d segments, so every
  * true match shares at least one segment VERBATIM, displaced by at most
  * the net insertions/deletions before it (≤ d positions). Index
  * (slot, source-length, segment); probe every substring of the other
  * side at the slot's length within ±d of the slot's start, for every
  * candidate partner length within ±d of its own. Candidates per string:
  * (d+1)·(2d+1)² — CONSTANT in corpus size; the join is a plain equi-
  * join on (slot, n, segment) that shuffles by segment value, and exact
  * `levenshtein` verifies survivors. At 100 TB: linear scan + keyed
  * shuffle, no quadratic stage anywhere.
  */
object FuzzyJoin {

  /** Segment start/length of slot `i` for a source string of length `n`
    * split into `k` segments: the first `k - n%k` segments get
    * ⌊n/k⌋ chars, the rest one more (the canonical even partition). */
  private def segLen(i: Column, n: Column, k: Int): Column = {
    val base = floor(n / k).cast("int")
    val rem = (n % k).cast("int")
    base + when(i >= lit(k) - rem, 1).otherwise(0)
  }
  private def segStart(i: Column, n: Column, k: Int): Column = {
    val base = floor(n / k).cast("int")
    val rem = (n % k).cast("int")
    i * base + greatest(i - (lit(k) - rem), lit(0))
  }

  /** All (a_id, b_id, dist) pairs with levenshtein(a.s, b.s) <= d and
    * a_id < b_id, over an `(id, s)` frame. Strings shorter than d+1
    * chars are excluded (a d+1-way partition needs d+1 chars; at d=2
    * that's strings of ≤2 tokens — below any dedup interest). */
  def passJoinPairs(enc: DataFrame, d: Int): DataFrame = {
    require(d >= 1, s"edit-distance threshold must be >= 1, got $d")
    val k = d + 1
    val e = enc.select(col("id"), col("s"), length(col("s")).cast("int").as("n"))
      .filter(col("n") >= k)
    // index side: the d+1 segments of each string, keyed by the string's
    // OWN length (probes enumerate partner lengths, so the key aligns)
    val idxSeg = e
      .select(col("id").as("a_id"), col("s").as("a_s"), col("n"),
        explode(sequence(lit(0), lit(d))).as("slot"))
      .withColumn("seg", substring_index_free(col("a_s"),
        segStart(col("slot"), col("n"), k) + 1, segLen(col("slot"), col("n"), k)))
      .select(col("a_id"), col("n"), col("slot"), col("seg"))
    // probe side: for each candidate partner length n' (±d of own) and
    // slot, every substring at the slot's length within ±d of the slot's
    // start — the sufficient (slightly superset) window of the paper's
    // multi-match-aware selection; completeness is what the oracle gates
    val probe = e
      .select(col("id").as("b_id"), col("s").as("b_s"), col("n").as("m"),
        explode(sequence(col("n") - d, col("n") + d)).as("n"))
      .filter(col("n") >= k)
      .select(col("b_id"), col("b_s"), col("m"), col("n"),
        explode(sequence(lit(0), lit(d))).as("slot"))
      .withColumn("len", segLen(col("slot"), col("n"), k))
      .withColumn("p0", segStart(col("slot"), col("n"), k))
      .select(col("b_id"), col("b_s"), col("n"), col("slot"), col("len"),
        explode(sequence(
          greatest(col("p0") - d, lit(0)),
          least(col("p0") + d, col("m") - col("len")))).as("p"))
      .withColumn("seg", substring_index_free(col("b_s"), col("p") + 1, col("len")))
      .select(col("b_id"), col("n"), col("slot"), col("seg"))
    val cand = idxSeg.join(probe, Seq("slot", "n", "seg"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    cand
      .join(e.select(col("id").as("a_id"), col("s").as("a_s")), "a_id")
      .join(e.select(col("id").as("b_id"), col("s").as("b_s")), "b_id")
      .withColumn("dist", levenshtein(col("a_s"), col("b_s")).cast(LongType))
      .filter(col("dist") <= d)
      .select(col("a_id"), col("b_id"), col("dist"))
  }

  /** `substring` with COLUMN start/len (the functions-API overload takes
    * literals only). */
  private def substring_index_free(s: Column, start: Column, len: Column): Column =
    s.substr(start, len)

  /** Token-level edit-distance near-dup self-join over `documents`: docs
    * whose token SEQUENCES differ by at most `d` single-token edits
    * (insert/delete/substitute). Tokens are encoded one-char-per-token
    * (the corpus vocabulary is ranked and mapped to chars), so character
    * levenshtein on the encoded strings IS token edit distance — the
    * same construction is reproduced verbatim in the DuckDB oracle. The
    * vocabulary is collected to the driver (it is vocabulary-sized —
    * same metadata-scale precedent as the BPE argmax) and shipped as a
    * map literal, keeping the encode stage map-only. */
  def fuzzyTokenJoin(spark: SparkSession, dir: String, d: Int = 2): DataFrame = {
    val docs = documents(spark, dir).select(col("doc_id"), col("text"))
    val vocab = docs.select(explode(split(col("text"), " ")).as("t"))
      .distinct().orderBy("t").collect().map(_.getString(0))
    // one printable ASCII char per token: 'A' + rank stays in [65, 122)
    require(vocab.length <= 57,
      s"one-char token encoding supports <= 57 distinct tokens, got ${vocab.length}")
    val enc2char = map(vocab.zipWithIndex.flatMap { case (t, i) =>
      Seq(lit(t), lit(((65 + i).toChar).toString))
    }.toIndexedSeq: _*)
    val enc = docs.select(col("doc_id").as("id"),
      array_join(transform(split(col("text"), " "), t => element_at(enc2char, t)), "")
        .as("s"))
    passJoinPairs(enc, d)
      .select(col("a_id"), col("b_id"), col("dist"))
      .orderBy("a_id", "b_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fuzzy_token_join" -> ((s: SparkSession, d: String) => fuzzyTokenJoin(s, d))
  )

  val oracles: Map[String, String] = Map(
    // the naive quadratic join with a length prefilter: any pair the
    // blocking misses (or invents) breaks the hash
    "fuzzy_token_join" ->
      """WITH v AS (SELECT t, chr(65 + CAST(row_number() OVER (ORDER BY t) AS INT) - 1) AS c
        |           FROM (SELECT DISTINCT unnest(string_split(text,' ')) AS t FROM documents)),
        |tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS t,
        |               generate_subscripts(string_split(text,' '), 1) AS pos FROM documents),
        |enc AS (SELECT doc_id, string_agg(c, '' ORDER BY pos) AS s
        |        FROM tok JOIN v USING (t) GROUP BY doc_id)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |       CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM enc a JOIN enc b ON a.doc_id < b.doc_id
        |WHERE abs(length(a.s) - length(b.s)) <= 2 AND levenshtein(a.s, b.s) <= 2
        |  AND length(a.s) >= 3 AND length(b.s) >= 3
        |ORDER BY a_id, b_id""".stripMargin
  )
}
