package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming forms of the event operators (the reference has
  * no streaming — "CDC" there is batch MERGE, SURVEY.md §2f — so this is
  * extension surface): the same column logic as graft.ext.EventOps
  * expressed over an unbounded source, plus a stateful sessionizer.
  *
  * Batch/stream parity by construction: `hourlyAgg` applies the identical
  * window+agg expressions as the batch `events_hourly_agg` query, so a
  * backfill (batch over history) and the live stream produce unionable
  * results — the standard lambda-free design at scale. */
object StreamOps {

  /** File stream over a testdata dir's events parquet. `readStream`
    * requires a user schema, and the `ts` physical type varies by fixture
    * generation (int64 nanos vs TIMESTAMP_NTZ micros) — so probe the
    * batch footer once and reuse its resolved schema, instead of baking
    * an encoding in. Downstream ops derive `ts_us` through the same
    * schema-probing [[graft.ops.Tables.tsUsExpr]] as the batch queries. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = graft.ops.Tables.events(spark, dir).schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
  }

  /** Streaming exact dedup: keep the first occurrence of each id,
    * dropping re-deliveries that arrive within the watermark horizon
    * (at-least-once sources re-send; this makes the downstream
    * exactly-once). `dropDuplicatesWithinWatermark` keys the state store
    * by id and EXPIRES entries once the watermark passes — bounded
    * state, unlike a plain streaming dropDuplicates whose key set grows
    * forever. `tsCol` must be the event-time column (nanoseconds, like
    * the events table). */
  def dedupStream(events: DataFrame, idCol: String = "event_id",
                  tsCol: String = "ts", watermark: String = "2 hours"): DataFrame = {
    val tmp = "__graft_dedup_ts"
    require(!events.columns.contains(tmp), s"input must not carry a $tmp column")
    events
      // integer ns→µs division via col() — no raw-SQL splice of the name
      .withColumn(tmp, timestamp_micros(call_function("div", col(tsCol), lit(1000L))))
      .withWatermark(tmp, watermark)
      .dropDuplicatesWithinWatermark(idCol)
      .drop(tmp)
  }

  /** Streaming TOKEN-SET dedup for a document stream: drop arrivals whose
    * token set was already seen within the watermark horizon — the
    * stream-side phase 0 of the batch dedup pipeline
    * ([[graft.ext.TextOps.dedupMinhashLsh]]'s set-digest collapse).
    * Strictly stronger than exact-text dedup (reordered or re-duplicated
    * tokens hash to the same set digest), strictly weaker than near-dup
    * LSH (which needs multi-key state and stays a batch/compaction
    * concern). State = one 64-bit digest per doc within the horizon,
    * expired by the watermark — bounded, like [[dedupStream]]. */
  def dedupSetStream(docs: DataFrame, textCol: String = "text",
                     tsCol: String = "ts", watermark: String = "2 hours"): DataFrame = {
    val key = "__graft_set_key"; val tmp = "__graft_dedup_ts"
    require(!docs.columns.contains(key) && !docs.columns.contains(tmp),
      s"input must not carry $key/$tmp columns")
    docs
      .withColumn(key, xxhash64(concat_ws("\u0001",
        array_sort(array_distinct(split(col(textCol), " "))))))
      .withColumn(tmp, timestamp_micros(call_function("div", col(tsCol), lit(1000L))))
      .withWatermark(tmp, watermark)
      .dropDuplicatesWithinWatermark(key)
      .drop(key, tmp)
  }

  /** Tumbling 1-hour aggregation with a 2-hour watermark: late events
    * beyond the watermark are dropped, finalized windows emit in append
    * mode. Identical expressions to the batch query. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withColumn("ts_micro", timestamp_micros(graft.ops.Tables.tsUsExpr(events)))
      .withWatermark("ts_micro", "2 hours")
      .groupBy(window(col("ts_micro"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(30, 2))).cast(DoubleType).as("sum_value"))
      .select(unix_micros(col("window.start")).as("hour_start_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming Misra–Gries heavy hitters per group — live monitoring of
    * the head of an ingest distribution (hot sources per language, hot
    * keys per table) without keeping the full item space in state: the
    * sketch is a mergeable TypedImperativeAggregate with O(k) state per
    * group, so complete-mode re-emission stays bounded no matter how
    * many distinct items flow past. Same expression as the batch
    * [[graft.ext.TextOps.heavyHitters]] sketch stage — the batch-parity
    * spec pins stream ≡ batch on the candidate guarantee (candidates ⊇
    * every item with frequency > N/k; the exact recount that turns
    * candidates into the true heavy set stays a batch/downstream step,
    * as in the batch query). */
  def streamHeavyHitters(docs: DataFrame, groupCol: String = "lang",
                         itemCol: String = "source", k: Int = 8): DataFrame = {
    require(docs.columns.contains(groupCol) && docs.columns.contains(itemCol),
      s"streamHeavyHitters input must carry '$groupCol' and '$itemCol' columns " +
        s"(has: ${docs.columns.mkString(", ")})")
    docs.groupBy(col(groupCol).as("group"))
      .agg(graft.functions.HeavyHitterFunctions.misra_gries(col(itemCol), k)
        .as("candidates"),
        count(lit(1)).as("n_total"))
  }

  case class UserAgg(user_id: Long, n_events: Long, total_value: Double, last_ts_us: Long)

  /** Stateful per-user running aggregate via mapGroupsWithState — the
    * KeyValueGroupedDataset custom-state path (update mode). State is one
    * tiny struct per key; at scale this shuffles once by user_id and the
    * state store partitions with it. */
  def runningUserAgg(spark: SparkSession,
                     events: Dataset[(Long, Long, Double)]): Dataset[UserAgg] = {
    import spark.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[UserAgg, UserAgg](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0, Long.MinValue))
          var n = prev.n_events; var tot = prev.total_value; var last = prev.last_ts_us
          rows.foreach { case (_, tsUs, v) =>
            n += 1; tot += v; if (tsUs > last) last = tsUs
          }
          val next = UserAgg(uid, n, tot, last)
          state.update(next)
          next
      }
  }

  /** Streaming CDC apply: upserts a change stream into a GraftTable via
    * foreachBatch + MERGE — the reference's batch CDC-apply pattern
    * (`IcebergSQLMergeAsDeleteInsert`) driven by a live stream. Each
    * micro-batch is one atomic table commit; `tsCol` (when set) guards
    * against late/out-of-order changes exactly like the reference's
    * `t.ts < s.ts` matched condition. The stream shuffles once per batch
    * by the merge key; table state is never collected to the driver. */
  def cdcApply(changes: DataFrame, table: graft.table.GraftTable,
               keys: Seq[String], tsCol: Option[String] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.dml._
    changes.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      // within one batch, keep only the newest change per key (a batch
      // may contain several versions of the same row)
      val latest = tsCol match {
        case Some(ts) =>
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(keys.map(col): _*).orderBy(col(ts).desc)
          batch.withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn")
        case None => batch.dropDuplicates(keys)
      }
      val guard = tsCol.map(ts => col(s"t.$ts") < col(s"s.$ts"))
      table.merge(latest, keys,
        matched = Seq(UpdateAllClause(guard)),
        notMatched = Seq(InsertAllClause()))
      ()
    }
  }

  /** Stream-stream event-time interval join (attribution): each purchase
    * joins the view events of the SAME user within the preceding
    * `horizonMinutes`. Both sides carry watermarks AND the join has a
    * time-bound condition, so Spark can expire buffered rows — the state
    * store holds one bounded window per side, never the whole history
    * (the requirement for any stream-stream join at scale). Input is one
    * raw events stream; the two sides are filtered from it
    * — joining two streams derived from one source is fully supported. */
  /** Streaming corpus-ingestion pipeline — the live twin of the batch
    * `corpus_release` query: quality gate (map-side filter, no state) →
    * watermarked token-set dedup ([[dedupSetStream]], bounded state) →
    * per (hour-window, lang) admission stats emitted as windows finalize
    * (append mode). Two stateful operators chained under one event-time
    * column — the Spark ≥3.4 multi-stateful shape; the dedup horizon and
    * the window watermark share `watermark`, so a doc admitted by the
    * dedup can never miss its window. At scale both stateful ops
    * partition on their keys (set digest / window+lang) with no extra
    * shuffle between them beyond the agg's own. `tsCol` is int64
    * nanoseconds (the synthetic-stream contract used by every op here). */
  def streamIngest(docs: DataFrame, textCol: String = "text",
                   tsCol: String = "ts", minTokens: Int = 5,
                   langCol: String = "lang",
                   watermark: String = "2 hours"): DataFrame = {
    val key = "__graft_set_key"; val tmp = "__graft_ingest_ts"
    require(!docs.columns.contains(key) && !docs.columns.contains(tmp),
      s"input must not carry $key/$tmp columns")
    Seq(textCol, tsCol, langCol).foreach(c =>
      require(docs.columns.contains(c),
        s"streamIngest input must carry a '$c' column (has: " +
          docs.columns.mkString(", ") + ")"))
    val t = split(col(textCol), " ")
    docs.filter(size(t) >= minTokens)
      // ONE event-time column + ONE watermark shared by both stateful
      // operators — Spark forbids redefining the watermark mid-chain
      .withColumn(key, xxhash64(concat_ws("\u0001",
        array_sort(array_distinct(t)))))
      .withColumn(tmp, timestamp_micros(call_function("div", col(tsCol), lit(1000L))))
      .withWatermark(tmp, watermark)
      .dropDuplicatesWithinWatermark(key)
      .groupBy(window(col(tmp), "1 hour"), col(langCol).as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(t).cast(LongType)).as("total_tokens"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("lang"), col("n_docs"), col("total_tokens"))
  }

  def attribution(events: DataFrame, horizonMinutes: Int = 60): DataFrame = {
    def side(t: String, pre: String) = events
      .filter(col("event_type") === t)
      .withColumn(s"${pre}_ts", timestamp_micros(graft.ops.Tables.tsUsExpr(events)))
      .withWatermark(s"${pre}_ts", "2 hours")
      .select(col("user_id").as(s"${pre}_user"), col("event_id").as(s"${pre}_id"),
        col(s"${pre}_ts"))
    val v = side("view", "v")
    val p = side("purchase", "p")
    p.join(v, col("p_user") === col("v_user")
        && col("v_ts") >= col("p_ts") - expr(s"INTERVAL $horizonMinutes MINUTES")
        && col("v_ts") <= col("p_ts"))
      .select(col("p_id").as("purchase_id"), col("v_id").as("view_id"),
        col("p_user").as("user_id"),
        unix_micros(col("p_ts")).as("purchase_ts_us"),
        unix_micros(col("v_ts")).as("view_ts_us"))
  }

  case class SessionOut(user_id: Long, session_start_us: Long, session_end_us: Long,
                        n_events: Long)
  case class SessionState(startUs: Long, endUs: Long, n: Long)

  /** Event-time sessionization with a 30-minute gap, via
    * flatMapGroupsWithState + event-time timeout: a session closes (and
    * emits) when the watermark passes its end + gap. */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapMinutes: Int = 30): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("ts_micro", timestamp_micros(graft.ops.Tables.tsUsExpr(events)))
      .withWatermark("ts_micro", "2 hours")
      // the watermarked TIMESTAMP column itself must reach the stateful
      // operator (projecting it into a bigint would drop the watermark tag)
      .select(col("user_id"), col("ts_micro"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, s.startUs, s.endUs, s.n))
          } else {
            val sorted = rows.map { r =>
              // full microsecond precision: getTime truncates to ms and
              // would desync session boundaries from the us-exact batch path
              val i = r._2.toInstant
              i.getEpochSecond * 1000000L + i.getNano / 1000L
            }.toSeq.sorted
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                // late-but-within-watermark arrivals land here with
                // t <= endUs: the window must only ever WIDEN (end = max,
                // start = min) — setting end = t unconditionally shrank
                // the session below its start and fired the gap timeout
                // early
                case Some(s) if t >= s.startUs - gapUs && t - s.endUs <= gapUs =>
                  cur = Some(SessionState(math.min(s.startUs, t),
                    math.max(s.endUs, t), s.n + 1))
                case Some(s) if t < s.startUs - gapUs =>
                  // beyond-gap BEFORE the open session: bounded state
                  // cannot re-open closed history — emit the straggler as
                  // its own single-event session (documented approximation
                  // of the batch gaps-and-islands result under late data)
                  closed ::= SessionOut(uid, t, t, 1)
                case Some(s) =>
                  closed ::= SessionOut(uid, s.startUs, s.endUs, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.endUs + gapUs) / 1000) // ms
            }
            closed.reverseIterator
          }
      }
  }

  /** The GRADED streaming query: [[hourlyAgg]] executed as a REAL
    * Structured Streaming job — file source over the events parquet,
    * `Trigger.AvailableNow`, complete-mode memory sink — whose FINAL
    * result hash-verifies against the SAME DuckDB SQL as the batch
    * `events_hourly_agg` query. Complete mode makes the final state equal
    * the batch aggregation by definition (no emission-timing ambiguity;
    * nothing is late inside one availableNow batch), so the oracle match
    * proves the streaming runtime — source, state store, window
    * finalization — computes the batch answer. At production scale the
    * identical plan runs in APPEND mode to a real sink with the 2-hour
    * watermark bounding state; complete+memory here is the graded
    * harness shape, sized by the output (windows × types), not the input. */
  def streamHourlyAggQuery(spark: SparkSession, dir: String): DataFrame = {
    val name = s"graft_shagg_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = hourlyAgg(eventsStream(spark, dir))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    // detach from the memory sink's table before returning: a later
    // streaming query (or block sweep) must not invalidate the frame —
    // then drop the sink's temp view so repeated runs don't accumulate
    // registrations in a long-lived session
    val out = spark.table(name).orderBy("hour_start_us", "event_type")
      .localCheckpoint(true)
    spark.catalog.dropTempView(name)
    out
  }

  /** A single sentinel event `marginHours` past the corpus' max event
    * time, schema-aligned with whatever physical `ts` encoding the
    * fixture generation uses. Written as ONE plain parquet file into
    * `fixtureDir` (so a mixed symlink+file listing stays flat — no
    * directory the source's partition discovery could misread). */
  private def writeSentinel(spark: SparkSession, ev: DataFrame,
                            fixtureDir: java.nio.file.Path,
                            sentinelUs: Long): Unit = {
    // tz-free NTZ literal: build the wall-clock string from UTC epoch
    // micros in JVM code (a TimestampType->NTZ cast would shift by the
    // session timezone)
    val ntz = java.time.LocalDateTime.ofEpochSecond(sentinelUs / 1000000L,
      ((sentinelUs % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    val one = spark.range(1).select(ev.schema.fields.map { f =>
      (f.name, f.dataType) match {
        case ("ts", LongType) => lit(sentinelUs * 1000L).as("ts") // int64 ns fixture
        case ("ts", TimestampNTZType) =>
          lit(ntz.toString.replace('T', ' ')).cast(TimestampNTZType).as("ts")
        case ("ts", _) => lit(java.time.Instant.ofEpochSecond(
          sentinelUs / 1000000L, (sentinelUs % 1000000L) * 1000L)).as("ts")
        case ("event_type", _) => lit("__sentinel").as("event_type")
        case (n, dt) => lit(null).cast(dt).as(n)
      }
    }.toIndexedSeq: _*)
    val scratch = java.nio.file.Files.createTempDirectory("graft_sentinel_w")
    try {
      one.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      val part = new java.io.File(scratch.toString).listFiles()
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error("sentinel write produced no parquet part"))
      java.nio.file.Files.copy(part.toPath,
        fixtureDir.resolve("zz_sentinel.parquet"))
    } finally deleteRecursively(scratch) // scratch copy served its purpose
  }

  /** Best-effort recursive delete of a query-scoped temp dir — Verify and
    * Bench invoke these queries hundreds of times per session, and a
    * leaked fixture copy per invocation accumulates into real disk. */
  private def deleteRecursively(p: java.nio.file.Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.isDirectory(p,
          java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        // Files.list holds an open DirectoryStream — close it or every
        // cleanup leaks one directory fd until GC (hundreds per session)
        val s = java.nio.file.Files.list(p)
        val children = try s.iterator().asScala.toSeq finally s.close()
        children.foreach(deleteRecursively)
      }
      java.nio.file.Files.deleteIfExists(p)
    } catch { case _: Exception => () }

  /** The APPEND-MODE graded streaming query — the production output shape
    * (finalized windows only, emitted once, state evicted by the
    * watermark), made gradable by a SENTINEL event: one `__sentinel` row
    * 4 hours past the corpus' max event time joins the streamed fixture
    * (the real events parquet is symlinked, never copied), so the final
    * watermark (sentinel − 2h) passes every REAL window's end and append
    * mode emits them all. The sentinel's own window never finalizes (its
    * end is always past its own watermark) and is filtered besides, so
    * the emitted rows equal the batch aggregation over the real events —
    * the SAME DuckDB oracle as `stream_hourly_agg` grades them. Complete
    * mode proved the streaming runtime computes the batch answer;
    * this proves the append-mode emission machinery — watermark
    * advancement, window finalization, state eviction — releases exactly
    * the finalized set. */
  def streamHourlyAggAppendQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.ops.Tables.events(spark, dir)
    val maxUs = ev.agg(max(graft.ops.Tables.tsUsExpr(ev)).as("m")).head().getLong(0)
    val sentinelUs = maxUs + 4L * 3600L * 1000000L
    val fixtureDir = java.nio.file.Files.createTempDirectory("graft_sappend")
    val src = java.nio.file.Paths.get(dir, "events.parquet").toAbsolutePath
    val link = fixtureDir.resolve("events.parquet")
    try java.nio.file.Files.createSymbolicLink(link, src)
    catch { case _: Throwable => // FS without symlink support: fall back to a copy
      java.nio.file.Files.copy(src, link) }
    writeSentinel(spark, ev, fixtureDir, sentinelUs)
    try {
    val stream = spark.readStream.schema(ev.schema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(fixtureDir.toString)
    val name = s"graft_sappend_${java.util.UUID.randomUUID().toString.take(8)}"
    // NO post-agg filter on event_type: a predicate on a grouping column
    // pushes below the aggregation AND the EventTimeWatermark node, which
    // would delete the sentinel at the scan — before its event time ever
    // advances the watermark (observed: the last 3 hours never emitted).
    // Exclusion of the sentinel's own window is guaranteed by append-mode
    // semantics instead: its end is always > the final watermark
    // (sentinel − 2h < floor(sentinel,1h) + 1h), so it never finalizes.
    val q = hourlyAgg(stream)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    val out = spark.table(name).orderBy("hour_start_us", "event_type")
      .localCheckpoint(true)
    spark.catalog.dropTempView(name)
    out
    // fixture dir (symlink/copy + sentinel part) is only read while the
    // AvailableNow drain runs; the checkpointed result no longer needs it
    } finally deleteRecursively(fixtureDir)
  }

  private val hourlyAggOracle: String =
    // identical SQL to the batch events_hourly_agg oracle — stream ≡ batch
    """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS hour_start_us, event_type,
      |  count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour_start_us, event_type""".stripMargin

  /** GRADED streaming CDC tail — the loop-closer between the changelog
    * read and the streaming runtime
    * ([[graft.catalog.GraftChangelogMicroBatchStream]]), the shape an
    * incremental-MV consumer actually runs: a keyed MoR table takes three
    * commits (full load, incremental append, upsert), then
    * `readStream.format("graft").option("changesFrom", 0)` tails it with
    * `maxVersionsPerBatch = 1` — THREE commit-aligned micro-batches, so
    * the insert/delete/pre-image rows really cross the micro-batch
    * planner, offset log, and sink, not one degenerate catch-up batch —
    * into a memory sink under Trigger.AvailableNow.
    *
    * The DuckDB oracle reconstructs the full changelog declaratively from
    * raw parquet, so the hash match proves source planning, pre-image
    * recovery (live-at-parent semi-filter), version stamping, and the
    * streaming runtime agree with the batch `changelog_read` law end to
    * end. State is bounded by construction: the tail holds no aggregation
    * state, only the source offset. */
  def streamCdcTailQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.table.GraftTable
    import graft.ops.Tables
    val cust = Tables.customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"))
    val t = GraftTable.create(spark, Tables.tmp("cdc_tail"), cust.schema,
      key = Seq("customer_id"), formatVersion = 2)
    t.append(cust.filter(col("customer_id") % 3 =!= 0))             // v1: full load
    t.append(cust.filter(col("customer_id") % 3 === 0))             // v2: incremental
    val hit = cust.filter(col("customer_id") % 10 === 0)
    t.rowDelta(hit.select(col("customer_id")),                      // v3: upsert
      hit.select(col("customer_id"), concat(col("name"), lit("-v2")).as("name")),
      Seq("customer_id"))
    val name = s"graft_cdct_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = spark.readStream.format("graft")
      .option("changesFrom", 0)
      .option("maxVersionsPerBatch", 1) // one commit per micro-batch
      .load(t.dir)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    val out = spark.table(name)
      .orderBy("_commit_version", "_change_type", "customer_id")
      .localCheckpoint(true)
    spark.catalog.dropTempView(name)
    out
  }

  private val streamCdcTailOracle: String =
    """SELECT customer_id, name, _change_type, _commit_version FROM (
      |  SELECT c_custkey AS customer_id, c_name AS name,
      |         'insert' AS _change_type, CAST(1 AS INT) AS _commit_version
      |  FROM customer WHERE c_custkey % 3 <> 0
      |  UNION ALL
      |  SELECT c_custkey, c_name, 'insert', CAST(2 AS INT)
      |  FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_name, 'delete', CAST(3 AS INT)
      |  FROM customer WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_name || '-v2', 'insert', CAST(3 AS INT)
      |  FROM customer WHERE c_custkey % 10 = 0
      |) ORDER BY _commit_version, _change_type, customer_id""".stripMargin

  /** GRADED streaming incremental MATERIALIZED VIEW — the pattern the
    * changelog read exists for, now driven end to end by the streaming
    * runtime: an aggregate table (per-segment count + DECIMAL balance
    * total, itself a governed keyed GraftTable) is seeded from the base
    * table's v1 state, then kept current by the CDC TAIL — each
    * commit-aligned micro-batch folds its ±row deltas (insert = +1/+bal,
    * delete pre-image = −1/−bal) into the MV with one keyed MoR upsert,
    * one atomic MV commit per source commit. The final answer is read
    * back from the MV table OFF DISK.
    *
    * The base table's last commit DRAINS one whole segment (a rowDelta
    * deleting every MACHINERY row), so the fold's TOMBSTONE path runs
    * end to end: the group's count reaches zero and the MV upsert retires
    * its key without re-inserting a row — the drained segment is
    * physically absent from the reloaded MV, exactly as it is absent
    * from the oracle's GROUP BY over the final base state.
    *
    * The DuckDB oracle recomputes the FINAL base-table state's rollup
    * directly from raw parquet, so the hash match proves the
    * MV-consistency law through the whole streaming stack: tail planning,
    * pre-image recovery, delta folding, MoR upsert, tombstoning, reload.
    * DECIMAL sums make the fold exactly associative, so the law holds
    * under ANY batch split — CdcStreamSpec pins one-commit-per-batch ≡
    * one catch-up batch; the graded query runs the catch-up shape rather
    * than paying per-commit streaming setup for a law the tests prove.
    * At 100 TB each delta pass touches only changed rows and the MV's
    * changed keys — never the base table. */
  def streamIncrementalMvQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.table.GraftTable
    import graft.ops.Tables
    val dec = DecimalType(28, 2)
    val cust = Tables.customer(spark, dir).select(col("c_custkey").as("id"),
      col("c_mktsegment").as("seg"),
      col("c_acctbal").cast(DecimalType(18, 2)).as("bal"))
    val base = GraftTable.create(spark, Tables.tmp("mv_base"), cust.schema,
      key = Seq("id"), formatVersion = 2)
    base.append(cust.filter(col("id") % 2 === 0))                    // v1: seed state
    // the MV: a governed keyed table seeded from the v1 rollup
    val mvDir = Tables.tmp("mv_agg")
    val mv0 = base.toDF.groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(col("bal")).cast(dec).as("total"))
    val mvT = GraftTable.create(spark, mvDir, mv0.schema,
      key = Seq("seg"), formatVersion = 2)
    mvT.append(mv0)
    // base evolves: incremental load, an upsert that edits balances, then
    // a DELETE that drains one whole segment to zero — the MV's tombstone
    // path (the drained group must be ABSENT from the reloaded MV, not a
    // zero husk)
    base.append(cust.filter(col("id") % 2 === 1))                     // v2
    val upd = cust.filter(col("id") % 10 === 2)
      .withColumn("bal", (col("bal") + 100).cast(DecimalType(18, 2)))
    base.rowDelta(upd.select(col("id")), upd, Seq("id"))              // v3: upsert
    // drain keys come from the source frame: base membership is exactly
    // cust (v1+v2 insert all rows, v3 upserts in place), so the delete
    // key set is identical without an extra MoR read of the base table
    base.rowDelta(cust.filter(col("seg") === "MACHINERY").select(col("id")),
      cust.limit(0), Seq("id"))                                       // v4: drain a group
    // the CDC tail from v1 keeps the MV current, one atomic MV commit per
    // micro-batch (exactly-once by the epoch ledger + AvailableNow). The
    // tail runs SPLIT — one batch per base commit (maxVersionsPerBatch=1)
    // — so the graded artifact itself exercises the multi-batch
    // epoch-ledger fold including the tombstone batch, not just the
    // single catch-up fold; batch-split invariance (DECIMAL sums are
    // exactly associative) is additionally pinned by CdcStreamSpec
    // (ADVICE r12: the per-commit path is load-bearing for exactly-once
    // and belongs in the official oracle run, not only in the suite).
    val q = spark.readStream.format("graft")
      .option("changesFrom", 1)
      .option("maxVersionsPerBatch", 1)
      .load(base.dir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyMvDeltas(batch, mvDir, "seg", "bal", "mv-maintainer", batchId)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    // the graded answer: the maintained MV, reloaded from disk — NO
    // liveness filter: the drained segment must be physically absent
    GraftTable.load(spark, mvDir).toDF
      .select(col("seg"), col("n").as("n_rows"),
        col("total").cast(DoubleType).as("total"))
      .orderBy("seg")
  }

  /** One micro-batch's MV maintenance step: fold the changelog batch's
    * ±row deltas (insert = +1/+value, delete pre-image = −1/−value) into
    * the `(group, n[, nn], total)` MV table with one keyed MoR upsert —
    * one atomic MV commit per batch, which also carries the
    * [[graft.table.GraftTable.MvBaseVersionProp]] freshness stamp the
    * transparent aggregate-rewrite rule gates on (stamp and content can
    * never diverge: same commit). DECIMAL arithmetic keeps the fold
    * exactly associative, so the maintained MV is invariant under the
    * batch SPLIT (one catch-up batch ≡ one batch per commit — pinned by
    * CdcStreamSpec). Deltas shuffle by the group key only; the MV join
    * touches the (tiny) MV table, never the base table.
    *
    * EXACTLY-ONCE under micro-batch replay: the upsert commits through
    * the MV table's [[graft.table.Snapshot.streamEpochs]] ledger keyed by
    * `(consumerId, batchId)` — a post-crash Spark retry of a committed
    * batch recomputes its (now stale) fold and the commit no-ops, so
    * deltas can never double-apply. Returns whether the batch committed
    * (false = ledger says it already had). Requires the streaming query
    * to be CHECKPOINTED with a `consumerId` stable across restarts, the
    * standard transactional-foreachBatch contract. */
  def applyMvDeltas(batch: DataFrame, mvDir: String,
                    groupCol: String, valueCol: String,
                    consumerId: String, batchId: Long): Boolean =
    applyMvDeltas(batch, mvDir, Seq(groupCol), valueCol, consumerId, batchId)

  /** Multi-column grouping form: the MV key (and the fold's shuffle key)
    * is the full `groupCols` tuple — `GROUP BY a, b` MVs fold and serve
    * exactly like single-column ones. */
  def applyMvDeltas(batch: DataFrame, mvDir: String,
                    groupCols: Seq[String], valueCol: String,
                    consumerId: String, batchId: Long): Boolean = {
    import graft.table.GraftTable
    val dec = DecimalType(28, 2)
    val mv = GraftTable.load(batch.sparkSession, mvDir)
    val mvCols = mv.snapshot.schema.fieldNames.toSeq
    // `nn` (count of NON-NULL values) is optional in the MV schema: with
    // it the MV can serve SQL-exact `sum(value)` (an all-NULL group's sum
    // is NULL, which `total` alone cannot distinguish from an exact-zero
    // sum) — the transparent-rewrite rule requires it; without it the fold
    // is the original (group, n, total) shape
    val hasNn = mvCols.contains("nn")
    val sign = when(col("_change_type") === "insert", 1).otherwise(-1)
    // FRESHNESS STAMP input, fused into the fold (r15, guide §1.2 "don't
    // compute things twice"): the previous shape ran a separate
    // `batch.agg(max(_commit_version)).head` action — a full second scan
    // of the batch per fold, O(commit size) at scale — before the upsert.
    // An Observation on the batch rides the epoch's own write jobs
    // instead; streamEpochUpsert evaluates the by-name extraProps only
    // after those jobs ran (and never on the ledger-no-op path, where
    // obs.get would block forever).
    val hasStamp = batch.columns.contains("_commit_version")
    val obs = org.apache.spark.sql.Observation()
    val observed =
      if (hasStamp) batch.observe(obs, max(col("_commit_version")).as("mcv"))
      else batch
    val aggs = Seq(
      sum(sign).cast(LongType).as("dn"),
      sum(col(valueCol) * sign).cast(dec).as("dtotal")) ++
      (if (hasNn) Seq(sum(when(col(valueCol).isNotNull, sign).otherwise(0))
        .cast(LongType).as("dnn")) else Nil)
    val deltas = observed.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // coalesce BOTH fold inputs: an all-NULL value group sums to NULL,
    // and NULL + total would store a NULL that the next fold resets to
    // zero — silently destroying the accumulated total (a NULL value
    // contributes 0 to the sum but still counts, the recompute's SUM
    // semantics)
    val folded = deltas.join(mv.toDF, groupCols, "left_outer")
    val next = folded.select(mvCols.map {
      case c if groupCols.contains(c) => col(c)
      case "n" => (coalesce(col("n"), lit(0L)) + col("dn")).as("n")
      case "nn" => (coalesce(col("nn"), lit(0L)) + col("dnn")).as("nn")
      case "total" => (coalesce(col("total"), lit(BigDecimal(0)).cast(dec)) +
        coalesce(col("dtotal"), lit(BigDecimal(0)).cast(dec)))
        .cast(dec).as("total")
      case other => throw new IllegalArgumentException(
        s"MV $mvDir has unexpected column $other " +
          s"(expected ${groupCols.mkString(", ")}, n[, nn], total)")
    }: _*)
    // FRESHNESS STAMP, atomic with the fold commit: after this batch the
    // MV reflects base content through the newest commit version the
    // batch carried — the rewrite rule serves the MV only while no
    // content-changing base commit postdates the stamp. An empty batch
    // (or one without the changelog's `_commit_version`) leaves the stamp
    // alone: stale-conservative, never unsound. Evaluated BY NAME inside
    // streamEpochUpsert after the epoch's write jobs materialized the
    // Observation — no separate stamp scan.
    def stamp: Map[String, String] =
      if (!hasStamp) Map.empty
      else obs.get.get("mcv").flatMap(Option(_)) match {
        case None => Map.empty
        case Some(v) => Map(GraftTable.MvBaseVersionProp -> v.toString)
      }
    // a group whose count drains to zero is TOMBSTONED — its key joins
    // the epoch's delete file but no row is re-inserted, so the group is
    // absent from the reloaded MV exactly as it is absent from a full
    // recompute's GROUP BY over the final base state
    mv.streamEpochUpsert(next, groupCols, consumerId, batchId,
      tombstoneWhen = Some(col("n") <= 0), extraProps = stamp,
      // `next` keys on the fold's groupBy output — unique by construction
      rowsUniqueByKey = true)
  }

  /** REFRESH core shared by GraftSql's `REFRESH MATERIALIZED VIEW` and
    * `CALL graft.system.refresh_mv`: folds the base changelog since the
    * MV's stamp through [[applyMvDeltas]] — exactly-once via the MV's
    * epoch ledger keyed on the target base version (a duplicate refresh
    * no-ops) — falling back to a full recompute when the range is not
    * changelog-expressible (an overwrite/rewrite landed in it). The MV
    * self-describes via its `graft.mv.*` properties, written at CREATE. */
  def refreshMv(spark: SparkSession, mvT: graft.table.GraftTable): Unit = {
    import graft.table.GraftTable
    val props = mvT.properties
    val baseDir = props.getOrElse(GraftTable.MvBaseDirProp,
      throw new IllegalArgumentException(s"${mvT.dir} is not a materialized " +
        s"view (no ${GraftTable.MvBaseDirProp} property)"))
    val groupCols = props(GraftTable.MvGroupColsProp).split(',').toSeq
    val v = props(GraftTable.MvValueColProp)
    val from = props(GraftTable.MvBaseVersionProp).toInt
    val baseT = GraftTable.load(spark, baseDir)
    val to = baseT.snapshot.version
    if (to > from) {
      try applyMvDeltas(baseT.changesBetween(from, to), mvT.dir, groupCols, v,
        s"mv-refresh:${mvT.dir}", to.toLong)
      catch { case _: IllegalArgumentException | _: IllegalStateException =>
        // changelog not expressible across this range: full recompute,
        // content first, stamp second (a crash between leaves the stamp
        // behind — stale-conservative, never wrong)
        val dec = DecimalType(28, 2)
        mvT.overwrite(baseT.toDF.groupBy(groupCols.map(col): _*).agg(
          count(lit(1)).cast(LongType).as("n"),
          count(col(v)).cast(LongType).as("nn"),
          coalesce(sum(col(v)), lit(BigDecimal(0))).cast(dec).as("total")))
        mvT.setProperties(Map(GraftTable.MvBaseVersionProp -> to.toString))
      }
    }
  }

  private val streamIncrementalMvOracle: String =
    """WITH f AS (SELECT c_mktsegment AS seg,
      |  CASE WHEN c_custkey % 10 = 2
      |       THEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100 AS DECIMAL(18,2))
      |       ELSE CAST(c_acctbal AS DECIMAL(18,2)) END AS bal
      |  FROM customer WHERE c_mktsegment <> 'MACHINERY')
      |SELECT seg, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(bal AS DECIMAL(28,2))) AS DOUBLE) AS total
      |FROM f GROUP BY seg
      |ORDER BY seg""".stripMargin

  /** GRADED streaming ingestion dedup against the GOVERNED LSH index —
    * the full production ingestion loop of a 100 TB corpus, end to end:
    * documents arrive as commit-aligned micro-batches (staged into a
    * source table in three `doc_id % 3` slices, tailed with
    * `maxVersionsPerBatch = 1` so arrival order is deterministic); each
    * batch probes the banded MinHash index ON DISK
    * ([[graft.ext.TextOps.probeDedupIndex]] — candidates by (band, bh)
    * equi-join, exact Jaccard ≥ 0.9 verify), near-dups of the
    * already-admitted corpus are rejected, and the survivors append to
    * BOTH the governed corpus table and the index tables — the index
    * grows with the corpus, so later batches dedup against everything
    * admitted before them. The graded answer is the admitted corpus
    * reloaded from disk.
    *
    * The DuckDB oracle replays the whole staged admission declaratively
    * (the shared banded-signature CTEs + exact Jaccard, stage k docs
    * rejected iff they match an ADMITTED doc of an earlier stage), so
    * the hash match proves the streaming runtime, the index lifecycle
    * (create → probe → append per batch), and the banding law agree.
    * Within-batch duplicates are both admitted by design (the index
    * updates after the batch) — the oracle encodes the same rule. */
  def streamIngestDedupQuery(spark: SparkSession, dir: String,
                             threshold: Double = 0.9): DataFrame = {
    import graft.table.GraftTable
    import graft.ops.Tables
    import graft.ext.TextOps
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val src = GraftTable.create(spark, Tables.tmp("ingest_src"), docs.schema)
    (0 until 3).foreach(s => src.append(docs.filter(col("doc_id") % 3 === s)))
    val idx = TextOps.createDedupIndex(spark)
    val corpus = GraftTable.create(spark, Tables.tmp("ingest_corpus"), docs.schema)
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerBatch", 1)
      .load(src.dir)
      .writeStream
      // checkpointed + a stable consumerId: the transactional-foreachBatch
      // contract the ledger-gated batch body needs for exactly-once
      .option("checkpointLocation", Tables.tmp("ingest_ckpt"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestDedupBatch(batch, corpus.dir, idx, "ingest-dedup", batchId,
          threshold)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    // the admitted corpus, reloaded from disk; arrival stage is
    // definitionally doc_id % 3 (the staging rule)
    GraftTable.load(spark, corpus.dir).toDF
      .select(col("doc_id"), md5(col("text")).as("text_md5"),
        (col("doc_id") % 3).cast(org.apache.spark.sql.types.IntegerType)
          .as("arrived_at"))
      .orderBy("doc_id")
  }

  /** One micro-batch of the governed ingestion loop — probe the index,
    * reject near-dups of the already-admitted corpus, land the survivors
    * in the corpus AND the index. Extracted from the foreachBatch closure
    * so crash-replay is directly testable (IngestCrashReplaySpec).
    *
    * CRASH-SAFE multi-table commit (VERDICT r13 item 1): all four commits
    * — corpus append, bands append, reps append, manifest publish — are
    * gated by their own table's exactly-once `(consumerId.<step>,
    * batchId)` [[graft.table.Snapshot.streamEpochs]] ledger. A post-crash
    * Spark replay of a committed batch no-ops every step; a crash BETWEEN
    * steps resumes at the first uncommitted one. Convergence is exact
    * because the replayed probe is deterministic: it reads the index
    * through the MANIFEST, which only advances as the batch's LAST step —
    * partial bands/reps appends are invisible to it, so the replay
    * recomputes the same admitted set and the ledgers skip what already
    * landed. (On a replay of a FULLY committed batch the probe sees the
    * batch's own docs and admits nothing — harmless, since every write is
    * a ledger no-op by then.) Requires the streaming query to be
    * CHECKPOINTED with a `consumerId` stable across restarts, the
    * standard transactional-foreachBatch contract; foreachBatch replays
    * run in batch order, so batch k converges before k+1 probes.
    *
    * Performance shape (VERDICT r12 item 5): only the narrow per-doc
    * state the dedup reuses — the banded signature (doc_id, band, bh)
    * and the token-hash digest (doc_id, htoks) — is materialized, SPILLED
    * to scratch parquet rather than the block cache (each is re-read by
    * up to three downstream joins; pinning digest arrays in storage was
    * the loop's dominant heap pressure). The raw text is never
    * materialized: the corpus write re-reads it from the batch's
    * one-commit file scan. The scratch dir is swept at batch end so a
    * long AvailableNow run's disk use does not grow with batch count
    * (ADVICE r13). */
  private[graft] def ingestDedupBatch(batch: DataFrame, corpusDir: String,
                                      idx: graft.ext.TextOps.DedupIndex,
                                      consumerId: String, batchId: Long,
                                      threshold: Double): Unit = {
    import graft.table.GraftTable
    import graft.ops.Tables
    import graft.ext.TextOps
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sess = batch.sparkSession
    val scratch = Tables.tmp(s"ingest_scratch_$batchId")
    try {
      // ONE md5-per-token pass per batch (r15, VERDICT item 2): the
      // previous shape spilled sig and ht as two independent writes, each
      // recomputing md5DocSets' per-token md5 (the batch's dominant CPU).
      // Now one job writes (doc_id, htoks, pairs) — htoks definitionally
      // identical, pairs carrying both 60-bit md5 blocks — and the banded
      // signature derives from the SCRATCH pairs (modular arithmetic
      // only, bit-identical construction; IngestCrashReplaySpec + the
      // oracle gate it).
      TextOps.md5DocHashPairs(batch.select(col("doc_id"), col("text")))
        .write.parquet(s"$scratch/ht")
      val htFull = sess.read.parquet(s"$scratch/ht")
      TextOps.md5BandedSignatureFromPairs(
        htFull.select(col("doc_id"), col("pairs")), idx.k, idx.bands)
        .write.parquet(s"$scratch/sig")
      val sig = sess.read.parquet(s"$scratch/sig")
      val ht = htFull.select(col("doc_id"), col("htoks"))
      val dupIds = TextOps.probeDedupIndexSig(sess, idx, sig, ht, threshold)
        .select(col("in_id").as("doc_id")).distinct()
      // the admitted-id set IS tiny (ids only) — cache it; it gates
      // three ledger-gated writes
      val liveIds = ht.select(col("doc_id"))
        .join(dupIds, Seq("doc_id"), "left_anti")
        .persist(MEMORY_AND_DISK)
      try {
        // corpus + both index-content appends are independent tables and
        // all precede the manifest publish — overlap them (guide §2.6).
        // The publish stays LAST: crash-replay convergence reads the
        // index through the manifest, and the corpus ledger must commit
        // before the manifest names the batch's index state (a published
        // index over an uncommitted corpus would make the replayed probe
        // reject the batch against itself).
        graft.ops.Par.run(
          () => { GraftTable.load(sess, corpusDir).streamEpochWrite(
            batch.select(col("doc_id"), col("text"))
              .join(liveIds, Seq("doc_id"), "left_semi"),
            s"$consumerId.corpus", batchId, replace = false); () },
          () => { TextOps.appendDedupIndexContentEpoch(sess, idx,
            sig.join(liveIds, Seq("doc_id"), "left_semi"),
            ht.join(liveIds, Seq("doc_id"), "left_semi"),
            consumerId, batchId); () })
        TextOps.publishDedupManifestEpoch(sess, idx, consumerId, batchId)
        ()
      } finally liveIds.unpersist()
    } finally {
      // Tables.tmp returns <unique-tmp-dir>/t — sweep the unique parent.
      // Best-effort: a failed sweep must never fail the batch.
      try org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(scratch).getParentFile)
      catch { case _: Exception => () }
    }
  }

  private def streamIngestDedupOracle(threshold: Double = 0.9): String =
    s"""WITH ${graft.ext.TextOps.md5BandedSqlCtes(64, 8, extraCols = "text,")},
       |st AS (SELECT doc_id, CAST(doc_id % 3 AS INT) AS s FROM d0),
       |p AS (SELECT DISTINCT bi.doc_id AS in_id, bc.doc_id AS corp_id
       |      FROM banded bi JOIN banded bc
       |        ON bi.band = bc.band AND bi.bh = bc.bh AND bi.doc_id <> bc.doc_id),
       |v AS (SELECT p.in_id, p.corp_id FROM p
       |      JOIN rh a ON a.doc_id = p.in_id
       |      JOIN rh b ON b.doc_id = p.corp_id
       |      WHERE CAST(len(list_intersect(a.htoks, b.htoks)) AS DOUBLE)
       |        / (len(a.htoks) + len(b.htoks) - len(list_intersect(a.htoks, b.htoks)))
       |        >= $threshold),
       |adm0 AS (SELECT doc_id FROM st WHERE s = 0),
       |adm1 AS (SELECT doc_id FROM st WHERE s = 1 AND doc_id NOT IN (
       |           SELECT v.in_id FROM v JOIN adm0 ON adm0.doc_id = v.corp_id)),
       |adm2 AS (SELECT doc_id FROM st WHERE s = 2 AND doc_id NOT IN (
       |           SELECT v.in_id FROM v
       |           WHERE v.corp_id IN (SELECT doc_id FROM adm0
       |                               UNION ALL SELECT doc_id FROM adm1))),
       |adm AS (SELECT doc_id FROM adm0 UNION ALL SELECT doc_id FROM adm1
       |        UNION ALL SELECT doc_id FROM adm2)
       |SELECT d0.doc_id, md5(d0.text) AS text_md5, st.s AS arrived_at
       |FROM adm JOIN d0 ON d0.doc_id = adm.doc_id JOIN st ON st.doc_id = adm.doc_id
       |ORDER BY d0.doc_id""".stripMargin

  /** GRADED transparent MV serving — the missing half of the
    * incremental-MV story: `stream_incremental_mv` proves the MAINTENANCE
    * law (changelog fold ≡ recompute); this proves the SERVING law (a
    * plain SQL `GROUP BY` over the BASE table is answered from the MV
    * when — and only when — the MV is provably fresh). Four phases, one
    * output row set each:
    *
    *  p1 — base registered with a changelog-folded MV (stamp atomic with
    *       the fold): the `SELECT seg, count(*), sum(bal) … GROUP BY`
    *       over the base resolves to the MV's O(groups) rows (asserted:
    *       the optimized plan scans the MV dir and never the base).
    *  p2 — a real base append lands WITHOUT MV maintenance: the stamp is
    *       behind a content-changing commit, the rewrite must decline,
    *       and the scan returns the post-append truth (asserted: base
    *       scanned). A wrongly-serving rewrite would hash-mismatch here.
    *  p3 — the maintenance fold catches the MV up (one applyMvDeltas
    *       batch over changesBetween): same SQL serves from the MV again
    *       and must equal p2's scan answer exactly — fold + serve ≡
    *       recompute, end to end.
    *  p4 — a metadata-only base commit (SET TBLPROPERTIES) postdates the
    *       stamp: the freshness walk sees a content-preserving op and the
    *       MV still serves (asserted) with unchanged values.
    *
    * The DuckDB oracle recomputes every phase's rollup from raw parquet,
    * so the hash match proves the rewrite rule's value path AND its
    * staleness gate; the plan-shape assertions (extension sessions only,
    * same contract as `stats_agg_fold`) prove which side answered. At
    * 100 TB the served plan reads the MV's per-group rows — never the
    * corpus — while every stale path degrades to a scan, not to a wrong
    * answer. */
  def mvRewriteServeQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.table.GraftTable
    import graft.ops.Tables
    val cust = Tables.customer(spark, dir).select(
      col("c_custkey").as("id"),
      col("c_mktsegment").as("seg"),
      col("c_acctbal").cast(DecimalType(18, 2)).as("bal"))
    val wh = Tables.tmp("mvr_wh")
    val cat = s"graftmvr${java.util.UUID.randomUUID().toString.take(8)}"
    graft.catalog.GraftCatalog.register(spark, wh, cat)
    val base = GraftTable.create(spark, s"$wh/db/base", cust.schema,
      key = Seq("id"), formatVersion = 2)
    base.append(cust.filter(col("id") % 10 < 8)) // v1: initial content
    // the MV starts EMPTY and is brought current by the production
    // maintenance step folding the full changelog — the freshness stamp
    // lands atomically with the fold commit
    val mvDir = s"$wh/db/seg_mv"
    GraftTable.create(spark, mvDir, StructType(Seq(
      StructField("seg", StringType), StructField("n", LongType),
      StructField("nn", LongType), StructField("total", DecimalType(28, 2)))),
      key = Seq("seg"), formatVersion = 2)
    var folded = 0 // base version the MV has folded through
    def maintain(batchId: Long): Unit = {
      val to = base.snapshot.version
      applyMvDeltas(base.changesBetween(folded, to), mvDir, "seg", "bal",
        "mv-rewrite-maintainer", batchId)
      folded = to
    }
    maintain(1)
    base.registerMv("by_seg", mvDir, "seg", "bal")
    val aggSql = s"SELECT seg, count(*) AS n_rows, sum(bal) AS total " +
      s"FROM $cat.db.base GROUP BY seg"
    val ruleInstalled = spark.sessionState.analyzer.extendedResolutionRules
      .exists(_.isInstanceOf[graft.catalog.ResolveGraftTables])
    def scansOnly(df: DataFrame, want: String, forbid: String): Boolean = {
      val paths = df.queryExecution.optimizedPlan.collectLeaves().flatMap {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              f.location.rootPaths.map(_.toString)
            case _ => Seq(l.simpleString(100))
          }
        case o => Seq(o.simpleString(100))
      }
      paths.exists(_.contains(want)) && !paths.exists(_.contains(forbid))
    }
    val p1 = spark.sql(aggSql)
    assert(!ruleInstalled || scansOnly(p1, "/db/seg_mv", "/db/base"),
      "fresh MV must serve the GROUP BY (plan must scan the MV, not the base)")
    val p1r = p1.localCheckpoint() // pin: later base commits must not move p1
    base.append(cust.filter(col("id") % 10 >= 8)) // content change, MV stale
    val p2 = spark.sql(aggSql)
    assert(!ruleInstalled || scansOnly(p2, "/db/base", "/db/seg_mv"),
      "stale MV must NOT serve (plan must scan the base)")
    val p2r = p2.localCheckpoint()
    maintain(2) // fold the append's changelog; stamp catches up atomically
    val p3 = spark.sql(aggSql)
    assert(!ruleInstalled || scansOnly(p3, "/db/seg_mv", "/db/base"),
      "refolded MV must serve again")
    val p3r = p3.localCheckpoint()
    base.setProperties(Map("audit.note" -> "metadata-only commit"))
    val p4 = spark.sql(aggSql)
    assert(!ruleInstalled || scansOnly(p4, "/db/seg_mv", "/db/base"),
      "content-preserving base commit must keep the MV fresh")
    def shape(df: DataFrame, phase: String) =
      df.select(lit(phase).as("phase"), col("seg"), col("n_rows"),
        col("total").cast(DoubleType).as("total"))
    shape(p1r, "p1_fresh").unionAll(shape(p2r, "p2_stale"))
      .unionAll(shape(p3r, "p3_refolded")).unionAll(shape(p4, "p4_meta_commit"))
      .orderBy("phase", "seg")
  }

  /** GRADED SQL front of the MV loop: `CREATE MATERIALIZED VIEW … AS
    * SELECT` (MV table + fold-identical seed + atomic-stamp registration)
    * and `REFRESH MATERIALIZED VIEW` (changelog fold, exactly-once via
    * the epoch ledger keyed on the target base version). Three phases:
    * p1 the just-created MV serves the GROUP BY; p2 a base append makes
    * it stale (scan answers, values current — a wrongly-fresh serve would
    * hash-mismatch); p3 REFRESH folds the delta and serving resumes with
    * p2's exact values. A duplicate REFRESH is asserted to no-op (the
    * ledger holds the target version). */
  def sqlCreateMvQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.table.GraftTable
    import graft.ops.Tables
    val cust = Tables.customer(spark, dir).select(
      col("c_custkey").as("id"),
      col("c_mktsegment").as("seg"),
      col("c_acctbal").cast(DecimalType(18, 2)).as("bal"))
    val wh = Tables.tmp("sqlmv_wh")
    val cat = s"graftsmv${java.util.UUID.randomUUID().toString.take(8)}"
    graft.catalog.GraftCatalog.register(spark, wh, cat)
    val base = GraftTable.create(spark, s"$wh/db/cust", cust.schema,
      key = Seq("id"), formatVersion = 2)
    base.append(cust.filter(col("id") % 10 < 8))
    val g = new graft.sql.GraftSql(spark)
    g.sql(s"CREATE MATERIALIZED VIEW $cat.db.cust_by_seg AS " +
      s"SELECT seg, count(*), sum(bal) FROM $cat.db.cust GROUP BY seg")
    val aggSql = s"SELECT seg, count(*) AS n_rows, sum(bal) AS total " +
      s"FROM $cat.db.cust GROUP BY seg"
    val ruleInstalled = spark.sessionState.analyzer.extendedResolutionRules
      .exists(_.isInstanceOf[graft.catalog.ResolveGraftTables])
    def scansOnly(df: DataFrame, want: String, forbid: String): Boolean = {
      val paths = df.queryExecution.optimizedPlan.collectLeaves().flatMap {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              f.location.rootPaths.map(_.toString)
            case _ => Seq(l.simpleString(100))
          }
        case o => Seq(o.simpleString(100))
      }
      paths.exists(_.contains(want)) && !paths.exists(_.contains(forbid))
    }
    val p1 = spark.sql(aggSql)
    assert(!ruleInstalled || scansOnly(p1, "/db/cust_by_seg", "/db/cust/"),
      "freshly created MV must serve the GROUP BY")
    val p1r = p1.localCheckpoint()
    base.append(cust.filter(col("id") % 10 >= 8))
    val p2 = spark.sql(aggSql)
    assert(!ruleInstalled || scansOnly(p2, "/db/cust/", "/db/cust_by_seg"),
      "stale MV must not serve")
    val p2r = p2.localCheckpoint()
    g.sql(s"REFRESH MATERIALIZED VIEW $cat.db.cust_by_seg")
    val vAfter = GraftTable.load(spark, s"$wh/db/cust_by_seg").snapshot.version
    g.sql(s"REFRESH MATERIALIZED VIEW $cat.db.cust_by_seg") // replay: ledger no-op
    assert(GraftTable.load(spark, s"$wh/db/cust_by_seg").snapshot.version == vAfter,
      "duplicate REFRESH must no-op through the epoch ledger")
    val p3 = spark.sql(aggSql)
    assert(!ruleInstalled || scansOnly(p3, "/db/cust_by_seg", "/db/cust/"),
      "refreshed MV must serve again")
    def shape(df: DataFrame, phase: String) =
      df.select(lit(phase).as("phase"), col("seg"), col("n_rows"),
        col("total").cast(DoubleType).as("total"))
    shape(p1r, "p1_created").unionAll(shape(p2r, "p2_stale"))
      .unionAll(shape(p3, "p3_refreshed"))
      .orderBy("phase", "seg")
  }

  private val sqlCreateMvOracle: String =
    """WITH c AS (SELECT c_custkey AS id, c_mktsegment AS seg,
      |  CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer),
      |p1 AS (SELECT seg, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(bal AS DECIMAL(28,2))) AS DOUBLE) AS total
      |  FROM c WHERE id % 10 < 8 GROUP BY seg),
      |pa AS (SELECT seg, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(bal AS DECIMAL(28,2))) AS DOUBLE) AS total
      |  FROM c GROUP BY seg)
      |SELECT 'p1_created' AS phase, * FROM p1
      |UNION ALL SELECT 'p2_stale', * FROM pa
      |UNION ALL SELECT 'p3_refreshed', * FROM pa
      |ORDER BY phase, seg""".stripMargin

  private val mvRewriteServeOracle: String =
    """WITH c AS (SELECT c_custkey AS id, c_mktsegment AS seg,
      |  CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer),
      |p1 AS (SELECT seg, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(bal AS DECIMAL(28,2))) AS DOUBLE) AS total
      |  FROM c WHERE id % 10 < 8 GROUP BY seg),
      |pa AS (SELECT seg, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(bal AS DECIMAL(28,2))) AS DOUBLE) AS total
      |  FROM c GROUP BY seg)
      |SELECT 'p1_fresh' AS phase, * FROM p1
      |UNION ALL SELECT 'p2_stale', * FROM pa
      |UNION ALL SELECT 'p3_refolded', * FROM pa
      |UNION ALL SELECT 'p4_meta_commit', * FROM pa
      |ORDER BY phase, seg""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mv_rewrite_serve" -> ((s: SparkSession, d: String) => mvRewriteServeQuery(s, d)),
    "sql_create_mv" -> ((s: SparkSession, d: String) => sqlCreateMvQuery(s, d)),
    "stream_ingest_dedup" -> ((s: SparkSession, d: String) => streamIngestDedupQuery(s, d)),
    "stream_hourly_agg" -> ((s: SparkSession, d: String) => streamHourlyAggQuery(s, d)),
    "stream_hourly_append" -> ((s: SparkSession, d: String) => streamHourlyAggAppendQuery(s, d)),
    "stream_cdc_tail" -> ((s: SparkSession, d: String) => streamCdcTailQuery(s, d)),
    "stream_incremental_mv" -> ((s: SparkSession, d: String) => streamIncrementalMvQuery(s, d)))

  val oracles: Map[String, String] = Map(
    // every phase's rollup recomputed from raw parquet: values prove the
    // rewrite's serve path AND its staleness gate (a wrongly-fresh serve
    // would replay p1's numbers at p2 and hash-mismatch)
    "mv_rewrite_serve" -> mvRewriteServeOracle,
    // the SQL-front twin: CREATE MATERIALIZED VIEW seeds + registers,
    // REFRESH folds the changelog exactly-once
    "sql_create_mv" -> sqlCreateMvOracle,
    "stream_hourly_agg" -> hourlyAggOracle,
    // append-mode emission with the sentinel-advanced watermark must
    // release exactly the batch aggregation — same oracle by design
    "stream_hourly_append" -> hourlyAggOracle,
    "stream_cdc_tail" -> streamCdcTailOracle,
    // the MV maintained incrementally by the tail must equal the FULL
    // recompute of the final base state — the MV-consistency law
    "stream_incremental_mv" -> streamIncrementalMvOracle,
    "stream_ingest_dedup" -> streamIngestDedupOracle())
}
