package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Tables._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with a typed metadata struct beside them; decode / feature
  * extraction runs batched per partition so a real decoder (image/audio
  * libs are not in this container) can amortize model/codec setup per
  * batch, exactly like a pandas-UDF/`mapInPandas` stage would.
  *
  * The decode step itself is a STUB — `decodeStub` derives deterministic
  * fake features from the bytes — but everything around it is real and
  * tested: the binary column schema, the partition-batched execution
  * shape, the typed output struct, and the downstream relational ops.
  */
object Multimodal {

  /** Typed record for a decoded media asset. */
  case class MediaFeatures(
      doc_id: Long,
      byte_len: Long,
      format: String,      // sniffed from header bytes
      width: Int,          // STUB: derived, a real decoder fills these
      height: Int,
      feature_hash: Long)  // stand-in for an embedding/frame signature

  /** STUB decoder: a real implementation would decode the payload
    * (image/audio/video) here. This fake is deterministic in the bytes so
    * tests and the harness stay reproducible. */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    var h = 1125899906842597L // deterministic FNV-ish fold over the payload
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val fmt =
      if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
      else if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
      else "raw"
    MediaFeatures(docId, bytes.length.toLong, fmt,
      width = (math.abs(h) % 1920).toInt, height = (math.abs(h / 7) % 1080).toInt,
      feature_hash = h)
  }

  /** Partition-batched decode over a binary column. `mapPartitions` keeps
    * the per-batch shape a heavyweight decoder needs (one codec/model
    * init per partition, streamed rows) — the Scala-native equivalent of
    * `mapInPandas`. */
  def decodeFeatures(spark: SparkSession, payloads: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast(LongType), col("payload").cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // a real decoder initializes its codec ONCE here, then streams
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** STUB resize: a real implementation would decode, resample to
    * (w, h), and re-encode. The fake deterministically re-chunks the
    * payload to `w*h` bytes (truncate or cycle-pad) so output size
    * contracts are testable. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    if (bytes.nonEmpty) {
      var i = 0
      while (i < out.length) { out(i) = bytes(i % bytes.length); i += 1 }
    }
    out
  }

  /** STUB frame sampling: a real implementation would demux a video and
    * decode every k-th frame. The fake slices the payload into `nFrames`
    * contiguous chunks ("frames") and returns them with frame indices. */
  def frameSampleStub(bytes: Array[Byte], nFrames: Int): Seq[(Int, Array[Byte])] = {
    if (bytes.isEmpty || nFrames <= 0) Seq.empty
    else {
      val sz = math.max(1, bytes.length / nFrames)
      (0 until nFrames).flatMap { f =>
        val start = f * sz
        if (start < bytes.length)
          Some((f, java.util.Arrays.copyOfRange(bytes, start,
            math.min(start + sz, bytes.length))))
        else None
      }
    }
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte], frame_len: Int)

  /** Partition-batched resize + frame-sample over the binary column —
    * one flatMap row → frames expansion, the shape a video pipeline needs
    * (each task holds one decoder, frames stream out without
    * materializing a per-document collection on the driver). */
  def sampleFrames(spark: SparkSession, payloads: DataFrame,
                   nFrames: Int, w: Int, h: Int): Dataset[Frame] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast(LongType), col("payload").cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real pipeline: init demuxer/decoder once per partition here
        it.flatMap { case (id, bytes) =>
          frameSampleStub(bytes, nFrames).map { case (idx, frame) =>
            val resized = resizeStub(frame, w, h)
            Frame(id, idx, resized, resized.length)
          }
        }
      }
  }

  /** documents.text re-cast as an opaque binary payload column — the
    * stand-in corpus for media bytes in this container. */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"),
        struct(col("source"), col("lang"), col("n_chars")).as("meta"))

  /** Oracle-gated query: binary column length + head-bytes hex through
    * pure SQL expressions (UTF-8 text payloads, so byte length and hex
    * agree with DuckDB's BLOB functions exactly). */
  private def multimodalBinary(spark: SparkSession, dir: String): DataFrame =
    payloads(spark, dir)
      .select(col("doc_id"),
        length(col("payload")).cast(LongType).as("byte_len"),
        hex(substring(col("payload"), 1, 8)).as("head_hex"),
        col("meta.source").as("source"))
      .orderBy("doc_id")

  /** Oracle-gated query driving the real mapPartitions decode path: the
    * stub's outputs are all byte-deterministic, so DuckDB reproduces them
    * — the FNV-ish fold as HUGEINT arithmetic mod 2⁶⁴ (bit-exact vs Java
    * wrapping long; payloads are ASCII, pinned by FixtureSchemaSpec, so
    * `ord(char) == byte`), the format sniff from hex head bytes. The
    * oracle therefore hash-verifies the full Dataset-encoder +
    * mapPartitions plumbing, not just a row count. */
  private def multimodalDecode(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, payloads(spark, dir)).toDF()
      .select(col("doc_id"), col("byte_len"), col("format"), col("feature_hash"))
      .orderBy("doc_id")

  /** Oracle-gated query driving the real flatMap row→frames expansion +
    * resize plumbing: the stub frame slicer and cycle-pad resize are both
    * byte-deterministic, so DuckDB reproduces every frame's md5 from the
    * same ASCII payload (frame chunk = substring; resize = the chunk
    * repeated then truncated to w·h bytes). A hash match proves the
    * Dataset-encoder frame expansion, the per-frame byte math, and the
    * binary md5 agree end to end — the real-decoder swap point keeps the
    * exact same shape. */
  private def multimodalFrames(spark: SparkSession, dir: String,
                               nFrames: Int = 4, w: Int = 8, h: Int = 4): DataFrame =
    sampleFrames(spark, payloads(spark, dir), nFrames, w, h).toDF()
      .select(col("doc_id"), col("frame_idx"), col("frame_len"),
        md5(col("frame_bytes")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")

  private def multimodalFramesOracle(nFrames: Int = 4, w: Int = 8, h: Int = 4): String = {
    val whSz = w * h
    s"""WITH d AS (SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS len
       |           FROM documents WHERE octet_length(CAST(text AS BLOB)) > 0),
       |sz AS (SELECT doc_id, text, len, greatest(1, len // $nFrames) AS sz FROM d),
       |fr AS (SELECT doc_id, CAST(f AS INT) AS frame_idx,
       |         substring(text, CAST(f * sz + 1 AS INT), CAST(sz AS INT)) AS chunk
       |       FROM sz, unnest(generate_series(0, ${nFrames - 1})) u(f)
       |       WHERE f * sz < len),
       |rs AS (SELECT doc_id, frame_idx,
       |         substring(repeat(chunk, CAST(ceil($whSz.0 / len(chunk)) AS INT)),
       |                   1, $whSz) AS resized
       |       FROM fr)
       |SELECT doc_id, frame_idx, CAST($whSz AS INT) AS frame_len,
       |       md5(resized) AS frame_md5
       |FROM rs ORDER BY doc_id, frame_idx""".stripMargin
  }


  /** Cross-document FRAME DEDUP — the duplicate-segment detector of a
    * video pipeline (shared intros/outros/watermark cards appear
    * verbatim across many assets; dropping them before training is the
    * video analogue of boilerplate removal): frames from the SAME
    * partition-batched decode+resize pipeline as `multimodal_frames`,
    * grouped by their frame signature, keeping groups seen in 2+
    * documents with a min-doc representative. The signature here is the
    * md5 of the stub-resized bytes; a real pipeline swaps in a
    * perceptual hash from the decoder and every stage after the
    * signature is unchanged. Scale shape: the only shuffle is keyed on
    * the 16-byte signature — frames' bytes never move past the map
    * side. */
  private def multimodalFrameDedup(spark: SparkSession, dir: String,
                                   nFrames: Int = 4, w: Int = 8, h: Int = 4): DataFrame =
    sampleFrames(spark, payloads(spark, dir), nFrames, w, h).toDF()
      .select(col("doc_id"), md5(col("frame_bytes")).as("frame_md5"))
      .groupBy(col("frame_md5"))
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("rep_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy("frame_md5")

  private def multimodalFrameDedupOracle(nFrames: Int = 4, w: Int = 8, h: Int = 4): String = {
    val whSz = w * h
    s"""WITH d AS (SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS len
       |           FROM documents WHERE octet_length(CAST(text AS BLOB)) > 0),
       |sz AS (SELECT doc_id, text, len, greatest(1, len // $nFrames) AS sz FROM d),
       |fr AS (SELECT doc_id,
       |         substring(text, CAST(f * sz + 1 AS INT), CAST(sz AS INT)) AS chunk
       |       FROM sz, unnest(generate_series(0, ${nFrames - 1})) u(f)
       |       WHERE f * sz < len),
       |rs AS (SELECT doc_id,
       |         md5(substring(repeat(chunk, CAST(ceil($whSz.0 / len(chunk)) AS INT)),
       |                       1, $whSz)) AS frame_md5
       |       FROM fr)
       |SELECT frame_md5, count(*) AS n_frames,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  min(doc_id) AS rep_doc
       |FROM rs GROUP BY frame_md5 HAVING count(DISTINCT doc_id) >= 2
       |ORDER BY frame_md5""".stripMargin
  }

  /** 32-bit AVERAGE-HASH perceptual frame signature (the aHash family:
    * threshold each cell of a small luma grid at the grid's mean): bit i
    * is set iff `luma_i · n > Σ luma` — the strict division-free form of
    * "above average". Integer arithmetic only, so DuckDB replays it
    * bit-for-bit. The property the signature exists for: a UNIFORM
    * brightness shift (+c on every cell, the simplest re-encode
    * perturbation) leaves the code unchanged, because
    * `(l+c)·n > Σl + c·n  ⇔  l·n > Σl` — near-identical re-encodes
    * collide where a byte hash (md5) scatters them. `shift` models that
    * re-encode: `aHash32(bytes, 1)` is the hash of the same frame
    * brightened by one luma step. */
  def aHash32(bytes: Array[Byte], shift: Int): Long = {
    val n = bytes.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += (bytes(i) & 0xFF).toLong; i += 1 }
    // the shift cancels in the comparison (see above) but is applied
    // anyway so the function really hashes the shifted frame
    sum += shift.toLong * n
    var code = 0L
    i = 0
    while (i < n) {
      if (((bytes(i) & 0xFF).toLong + shift) * n > sum) code |= (1L << i)
      i += 1
    }
    code
  }

  /** Cross-document frame dedup under the PERCEPTUAL signature — the
    * upgrade [[multimodalFrameDedup]]'s doc promises: the md5-of-bytes
    * signature is swapped for the 32-bit average-hash of the stub-decoded
    * 8×4 luma grid ([[aHash32]]), and every stage after the signature is
    * unchanged. To prove the property that motivates the swap, the query
    * PLANTS re-encoded duplicates: every `everyK`-th document re-enters
    * (as `doc_id + reOffset`) with all frame lumas shifted +1 — a
    * different byte stream (md5 would scatter it) whose aHash collides
    * with the original by construction, so each planted document's frames
    * must surface inside their original's signature group
    * (`has_reencode = 1`). Scale shape identical to the md5 variant: the
    * signature is computed in the partition-batched decoder, and the only
    * shuffle is keyed on the 8-byte code — frame bytes never move. */
  private def multimodalFrameDedupPhash(spark: SparkSession, dir: String,
                                        nFrames: Int = 4, w: Int = 8, h: Int = 4,
                                        everyK: Int = 10,
                                        reOffset: Long = 10000000L): DataFrame = {
    import spark.implicits._
    sampleFrames(spark, payloads(spark, dir), nFrames, w, h)
      .mapPartitions { it =>
        // the perceptual hash is decoder-stage work: computed here, in the
        // same per-partition batch as the (stub) decode+resize
        it.flatMap { f =>
          val base = (f.doc_id, aHash32(f.frame_bytes, 0))
          if (f.doc_id % everyK == 0)
            Iterator(base, (f.doc_id + reOffset, aHash32(f.frame_bytes, 1)))
          else Iterator.single(base)
        }
      }
      .toDF("doc_id", "ahash")
      .groupBy(col("ahash"))
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("rep_doc"),
        max(when(col("doc_id") >= reOffset, 1).otherwise(0)).as("has_reencode"))
      .filter(col("n_docs") >= 2)
      .orderBy("ahash")
  }

  /** DuckDB mirror of [[multimodalFrameDedupPhash]]: the same frame
    * slicing/cycle-pad resize as the other frame oracles, lumas as
    * `ord()` over the ASCII payload (byte == codepoint, pinned by
    * FixtureSchemaSpec), the planted re-encode as luma+1 rows, and the
    * aHash as integer compare-and-shift arithmetic (`SUM` of bit values
    * cast back from HUGEINT, HACKING rule 2). */
  private def multimodalFrameDedupPhashOracle(nFrames: Int = 4, w: Int = 8, h: Int = 4,
                                              everyK: Int = 10,
                                              reOffset: Long = 10000000L): String = {
    val whSz = w * h
    s"""WITH d AS (SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS len
       |           FROM documents WHERE octet_length(CAST(text AS BLOB)) > 0),
       |sz AS (SELECT doc_id, text, len, greatest(1, len // $nFrames) AS sz FROM d),
       |fr AS (SELECT doc_id, CAST(f AS INT) AS frame_idx,
       |         substring(text, CAST(f * sz + 1 AS INT), CAST(sz AS INT)) AS chunk
       |       FROM sz, unnest(generate_series(0, ${nFrames - 1})) u(f)
       |       WHERE f * sz < len),
       |rs AS (SELECT doc_id, frame_idx,
       |         substring(repeat(chunk, CAST(ceil($whSz.0 / len(chunk)) AS INT)),
       |                   1, $whSz) AS resized
       |       FROM fr),
       |fx AS (SELECT doc_id, frame_idx, resized, 0 AS shift FROM rs
       |       UNION ALL
       |       SELECT doc_id + $reOffset, frame_idx, resized, 1 FROM rs
       |       WHERE doc_id % $everyK = 0),
       |lum AS (SELECT doc_id, frame_idx, CAST(i AS INT) AS i,
       |          ord(substring(resized, CAST(i AS INT), 1)) + shift AS l
       |        FROM fx, unnest(generate_series(1, $whSz)) u(i)),
       |t AS (SELECT doc_id, frame_idx, CAST(SUM(l) AS BIGINT) AS tot
       |      FROM lum GROUP BY doc_id, frame_idx),
       |ah AS (SELECT l.doc_id,
       |         CAST(SUM(CASE WHEN l.l * $whSz > t.tot
       |                       THEN (CAST(1 AS BIGINT) << (l.i - 1)) ELSE 0 END)
       |              AS BIGINT) AS ahash
       |       FROM lum l JOIN t ON l.doc_id = t.doc_id AND l.frame_idx = t.frame_idx
       |       GROUP BY l.doc_id, l.frame_idx)
       |SELECT ahash, count(*) AS n_frames,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  min(doc_id) AS rep_doc,
       |  MAX(CASE WHEN doc_id >= $reOffset THEN 1 ELSE 0 END) AS has_reencode
       |FROM ah GROUP BY ahash HAVING count(DISTINCT doc_id) >= 2
       |ORDER BY ahash""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_binary" -> multimodalBinary,
    "multimodal_decode" -> multimodalDecode,
    "multimodal_frames" -> ((s: SparkSession, d: String) => multimodalFrames(s, d)),
    "multimodal_frame_dedup" -> ((s: SparkSession, d: String) => multimodalFrameDedup(s, d)),
    "multimodal_frame_dedup_phash" ->
      ((s: SparkSession, d: String) => multimodalFrameDedupPhash(s, d))
  )

  val oracles: Map[String, String] = Map(
    "multimodal_frames" -> multimodalFramesOracle(),
    "multimodal_frame_dedup" -> multimodalFrameDedupOracle(),
    "multimodal_frame_dedup_phash" -> multimodalFrameDedupPhashOracle(),
    "multimodal_binary" ->
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
        |  hex(CAST(substring(text, 1, 8) AS BLOB)) AS head_hex, source
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_decode" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
        |    hex(CAST(substring(text, 1, 4) AS BLOB)) AS head,
        |    list_reduce(
        |      list_prepend(CAST(1125899906842597 AS HUGEINT),
        |        list_transform(generate_series(1, len(text)),
        |          i -> CAST(ord(substring(text, i, 1)) AS HUGEINT))),
        |      (acc, b) -> CAST((acc * 31 + b)
        |        % CAST(18446744073709551616 AS HUGEINT) AS HUGEINT)) AS hh
        |  FROM documents)
        |SELECT doc_id, byte_len,
        |  CASE WHEN byte_len >= 2 AND substring(head, 1, 4) = 'FFD8' THEN 'jpeg'
        |       WHEN byte_len >= 4 AND substring(head, 1, 2) = '89'
        |            AND substring(head, 3, 2) = '50' THEN 'png'
        |       ELSE 'raw' END AS format,
        |  CAST(CASE WHEN hh >= 9223372036854775808
        |            THEN hh - 18446744073709551616 ELSE hh END AS BIGINT) AS feature_hash
        |FROM f ORDER BY doc_id""".stripMargin
  )
}
