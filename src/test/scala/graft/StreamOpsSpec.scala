package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamOps

class StreamOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private val H = 3600L * 1000000L // one hour in µs

  test("hourlyAgg over a file stream matches the batch query") {
    val stream = StreamOps.eventsStream(spark, "/root/testdata/sf0.001")
    val q = StreamOps.hourlyAgg(stream)
      .writeStream.format("memory").queryName("hourly").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly")
      val batch = graft.ext.EventOps.queries("events_hourly_agg")(spark, "/root/testdata/sf0.001")
      // append mode only emits windows the watermark has passed; every
      // emitted row must exactly match its batch counterpart
      val s = streamed.collect().map(_.toSeq).toSet
      val b = batch.collect().map(_.toSeq).toSet
      assert(s.nonEmpty)
      assert(s.subsetOf(b))
    } finally q.stop()
  }

  test("append mode with a sentinel: every real window finalizes, state " +
    "holds ONLY the sentinel's own never-finalized window") {
    import java.time.LocalDateTime
    // 5 hours x 2 types of real events, plus one __sentinel 8h past the
    // start: final watermark = sentinel - 2h = 6h > every real window end
    val base = LocalDateTime.of(2024, 1, 1, 0, 0)
    val real = for { h <- 0 until 5; k <- 0 until 3 } yield
      (base.plusHours(h.toLong).plusMinutes(k * 7L), s"t${k % 2}", 1.0 + k)
    val rows = real :+ ((base.plusHours(8), "__sentinel", 0.0))
    val dir = TestSpark.tmpDir("sappend_state")
    rows.toDF("ts", "event_type", "value").coalesce(1)
      .write.parquet(s"$dir/events.parquet")
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val q = StreamOps.hourlyAgg(
      spark.readStream.schema(batch.schema).parquet(s"$dir/events.parquet"))
      .writeStream.format("memory").queryName("sappend_state")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    val got = spark.table("sappend_state").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val want = StreamOps.hourlyAgg(batch) // same exprs, batch plan
      .filter(col("event_type") =!= "__sentinel").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === want, "append emission must equal the batch agg over real events")
    assert(got.size === 10, "5 hours x 2 types must all have finalized")
    // watermark-bounded state: after the flush batch, the store holds
    // exactly the windows the watermark has NOT passed — the sentinel's
    // own (1 window x 1 type). Unbounded state would show ~11 rows here.
    val st = q.lastProgress.stateOperators
    assert(st.nonEmpty && st.head.numRowsTotal === 1,
      s"state must hold only the sentinel window, got ${st.map(_.numRowsTotal).mkString(",")}")
  }

  test("runningUserAgg accumulates state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val q = StreamOps.runningUserAgg(spark, mem.toDS())
      .writeStream.format("memory").queryName("running").outputMode("update").start()
    try {
      mem.addData((1L, 10L, 1.0), (1L, 20L, 2.0), (2L, 5L, 7.0))
      q.processAllAvailable()
      mem.addData((1L, 30L, 4.0))
      q.processAllAvailable()
      val byUser = spark.table("running").orderBy($"n_events".desc)
        .as[StreamOps.UserAgg].collect()
      val u1 = byUser.filter(_.user_id == 1L).maxBy(_.n_events)
      assert(u1.n_events == 3 && u1.total_value == 7.0 && u1.last_ts_us == 30L)
      val u2 = byUser.filter(_.user_id == 2L).maxBy(_.n_events)
      assert(u2.n_events == 1 && u2.total_value == 7.0)
    } finally q.stop()
  }

  test("attribution: stream-stream interval join matches the batch join") {
    val raw = StreamOps.eventsStream(spark, "/root/testdata/sf0.001")
    val q = StreamOps.attribution(raw, horizonMinutes = 60)
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("attrib").collect().map(_.toSeq).toSet
      // batch twin: identical join logic over the static frame
      val ev = graft.ops.Tables.eventsWithTs(spark, "/root/testdata/sf0.001")
      val v = ev.filter($"event_type" === "view")
        .select($"user_id".as("v_user"), $"event_id".as("view_id"), $"ts_us".as("view_ts_us"))
      val p = ev.filter($"event_type" === "purchase")
        .select($"user_id".as("p_user"), $"event_id".as("purchase_id"), $"ts_us".as("purchase_ts_us"))
      val batch = p.join(v, $"p_user" === $"v_user"
          && $"view_ts_us" >= $"purchase_ts_us" - 3600L * 1000000L
          && $"view_ts_us" <= $"purchase_ts_us")
        .select($"purchase_id", $"view_id", $"p_user".as("user_id"),
          $"purchase_ts_us", $"view_ts_us")
        .collect().map(_.toSeq).toSet
      assert(streamed.nonEmpty)
      // append mode emits a pair once the watermark passes; every emitted
      // pair must be a true batch pair, and most batch pairs must emit
      assert(streamed.subsetOf(batch))
      assert(streamed.size >= batch.size / 2)
    } finally q.stop()
  }

  test("cdcApply: streamed upserts land as atomic MERGE commits") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.types._
    val t = graft.table.GraftTable.create(spark, TestSpark.tmpDir("cdc"),
      StructType(Seq(StructField("customer_id", LongType),
        StructField("name", StringType), StructField("ts", IntegerType))))
    t.append(Seq((1L, "customer_a", 1), (2L, "customer_b", 1))
      .toDF("customer_id", "name", "ts"))
    val mem = MemoryStream[(Long, String, Int)]
    val q = graft.streaming.StreamOps.cdcApply(
      mem.toDS().toDF("customer_id", "name", "ts"), t,
      keys = Seq("customer_id"), tsCol = Some("ts"))
      .start()
    try {
      // batch 1: stale change for key 1 (ts 1 !< 1), fresh for 2, insert 3;
      // key 3 arrives twice in the batch — latest-by-ts must win
      mem.addData((1L, "stale", 1), (2L, "b-v2", 2), (3L, "c-v1", 1), (3L, "c-v2", 2))
      q.processAllAvailable()
      val got = t.toDF.orderBy("customer_id").as[(Long, String, Int)].collect().toSeq
      assert(got == Seq((1L, "customer_a", 1), (2L, "b-v2", 2), (3L, "c-v2", 2)))
      // batch 2: another upsert stacks on the new state
      mem.addData((1L, "a-v2", 5))
      q.processAllAvailable()
      assert(t.toDF.filter($"customer_id" === 1L).as[(Long, String, Int)].head() ==
        ((1L, "a-v2", 5)))
    } finally q.stop()
  }

  test("streamed ingestion dedup against the table-backed LSH index: probe then admit") {
    // the production ingest loop: every micro-batch (a) probes the
    // GOVERNED index tables for near-dups of the existing corpus, and
    // (b) appends its own signatures so LATER batches dedup against it —
    // foreachBatch makes both steps per-epoch atomic-enough (each append
    // is one table commit). Asserts cross-batch visibility: a near-dup
    // of a batch-1 doc arriving in batch 2 is flagged, a novel doc is
    // not, and the flagged pairs carry the exact verified Jaccard.
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 80).map(i => s"tok$i").mkString(" ")
    val nearDup = ((1 to 79).map(i => s"tok$i") :+ "different").mkString(" ")
    val novel = (1 to 80).map(i => s"other$i").mkString(" ")
    val idx = graft.ext.TextOps.createDedupIndex(spark)
    // seed corpus: one doc
    graft.ext.TextOps.appendDedupIndex(spark,
      idx, graft.ext.TextOps.md5DocSets(Seq((100L, base)).toDF("doc_id", "text")))
    val flagged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the micro-batch frame lives in a CLONED session — register the
        // native functions and load the index tables through IT, not the
        // outer test session (same rule as the sink's epoch commits)
        val s = batch.sparkSession
        val prepped = graft.ext.TextOps.md5DocSets(batch).localCheckpoint(true)
        flagged ++= graft.ext.TextOps
          .probeDedupIndex(s, idx, prepped, threshold = 0.9)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        graft.ext.TextOps.appendDedupIndex(s, idx, prepped)
        ()
      }.start()
    try {
      mem.addData((1L, base), (2L, novel)) // 1 dups the seed, 2 is new
      q.processAllAvailable()
      assert(flagged.toSet == Set((1L, 100L, 1.0)), s"batch1: $flagged")
      flagged.clear()
      // batch 2: near-dup of batch-1's doc 1 (cross-batch index growth)
      mem.addData((3L, nearDup))
      q.processAllAvailable()
      // doc 3 is a near-dup of BOTH the seed and doc 1 (same content)
      assert(flagged.map(p => (p._1, p._2)).toSet == Set((3L, 100L), (3L, 1L)),
        s"batch2: $flagged")
      assert(flagged.forall(p => p._3 > 0.9 && p._3 < 1.0), s"jac: $flagged")
    } finally q.stop()
  }

  test("toStreamDF tails table appends as micro-batches") {
    import org.apache.spark.sql.types._
    val t = graft.table.GraftTable.create(spark, TestSpark.tmpDir("tail"),
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))))
    t.append(Seq((1L, "a")).toDF("id", "v"))
    val q = t.toStreamDF.writeStream.format("memory").queryName("tailed")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("tailed").count() == 1)
      t.append(Seq((2L, "b"), (3L, "c")).toDF("id", "v"))
      q.processAllAvailable()
      val got = spark.table("tailed").orderBy("id").as[(Long, String)].collect().toSeq
      assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("toStreamDF never surfaces staged (unpublished) WAP dirs") {
    // regression: the old file-stream tail of the raw data/ root surfaced
    // stageAppend dirs before publish — breaking the WAP invisibility
    // contract; the DSv2 version-offset source reads committed dirs only
    import org.apache.spark.sql.types._
    val t = graft.table.GraftTable.create(spark, TestSpark.tmpDir("wap-stream"),
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))))
    t.append(Seq((1L, "a")).toDF("id", "v"))
    val q = t.toStreamDF.writeStream.format("memory").queryName("wapstream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("wapstream").count() == 1)
      val id = t.stageAppend(Seq((2L, "staged"), (3L, "staged")).toDF("id", "v"))
      q.processAllAvailable()
      assert(spark.table("wapstream").count() == 1,
        "staged (uncommitted) rows leaked into the stream")
      t.publishStaged(id)
      q.processAllAvailable()
      assert(spark.table("wapstream").orderBy("id").as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "staged"), (3L, "staged")))
    } finally q.stop()
  }

  test("table-to-table streaming pipeline: tail source, CDC-merge into target") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType),
      StructField("ts", IntegerType)))
    val src = graft.table.GraftTable.create(spark, TestSpark.tmpDir("pipe-src"), schema)
    val dst = graft.table.GraftTable.create(spark, TestSpark.tmpDir("pipe-dst"), schema)
    src.append(Seq((1L, "a", 1), (2L, "b", 1)).toDF("id", "v", "ts"))
    val q = graft.streaming.StreamOps.cdcApply(
      src.toStreamDF, dst, keys = Seq("id"), tsCol = Some("ts")).start()
    try {
      q.processAllAvailable()
      assert(dst.toDF.count() == 2)
      // a later change upserts through the stream into the target table
      src.append(Seq((1L, "a-v2", 2), (3L, "c", 1)).toDF("id", "v", "ts"))
      q.processAllAvailable()
      val got = dst.toDF.orderBy("id").as[(Long, String, Int)].collect().toSeq
      assert(got == Seq((1L, "a-v2", 2), (2L, "b", 1), (3L, "c", 1)))
    } finally q.stop()
  }

  test("sessionize closes sessions on gap and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)] // (event_id, ts_ns, user marker)
    val src = mem.toDS().toDF("event_id", "ts", "utag")
      .withColumn("user_id", when($"utag" === "a", 1L).otherwise(2L))
    val q = StreamOps.sessionize(spark, src)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      val ns = 1000000000L
      // user a: two events 5 min apart (one session), then an event 2h
      // later — the gap closes session 1; the watermark (2h behind max
      // event time) then needs a further push to emit it
      mem.addData((1L, 1000L * ns, "a"), (2L, 1300L * ns, "a"))
      q.processAllAvailable()
      mem.addData((3L, (1000L + 7200L) * ns, "a"))
      q.processAllAvailable()
      // advance watermark far past everything
      mem.addData((4L, (1000L + 7200L * 4) * ns, "a"))
      q.processAllAvailable()
      val out = spark.table("sessions").as[StreamOps.SessionOut].collect()
      val first = out.find(_.session_start_us == 1000L * 1000000L)
      assert(first.isDefined, s"expected first session emitted, got ${out.mkString(",")}")
      assert(first.get.n_events == 2 && first.get.session_end_us == 1300L * 1000000L)
    } finally q.stop()
  }

  test("streaming sink: writeStream.format(graft) appends one snapshot per epoch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = TestSpark.tmpDir("sink")
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDS().toDF("id", "v")
      .writeStream.format("graft")
      .option("path", dir)
      .option("checkpointLocation", TestSpark.tmpDir("sink-cp"))
      .outputMode("append").start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
      val t = graft.table.GraftTable.load(spark, dir)
      assert(t.toDF.orderBy("id").as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "b"), (3L, "c")))
      // two data epochs → two append snapshots on the auto-created table
      assert(t.currentVersion == 2)
      // exactly-once ledger recorded the last epoch for this query
      assert(t.snapshot.streamEpochs.values.max >= 1L)
    } finally q.stop()
  }

  test("streaming sink: complete mode overwrites with the latest aggregate") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.types._
    val dir = TestSpark.tmpDir("sink-agg")
    graft.table.GraftTable.create(spark, dir, StructType(Seq(
      StructField("v", StringType), StructField("n", LongType))))
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDS().toDF("id", "v")
      .groupBy($"v").agg(count("*").as("n"))
      .writeStream.format("graft")
      .option("path", dir)
      .option("checkpointLocation", TestSpark.tmpDir("sink-agg-cp"))
      .outputMode("complete").start()
    try {
      mem.addData((1L, "x"), (2L, "x"), (3L, "y"))
      q.processAllAvailable()
      mem.addData((4L, "x"))
      q.processAllAvailable()
      val t = graft.table.GraftTable.load(spark, dir)
      // table holds ONLY the latest epoch's aggregate (overwrite per epoch)
      assert(t.toDF.orderBy("v").as[(String, Long)].collect().toSeq ==
        Seq(("x", 3L), ("y", 1L)))
    } finally q.stop()
  }

  test("streaming sink maintains layout on partitioned, key-sorted tables") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.types._
    val dir = TestSpark.tmpDir("sink-part")
    graft.table.GraftTable.create(spark, dir,
      StructType(Seq(StructField("id", LongType), StructField("d", DateType))),
      spec = Seq(graft.table.PartitionField("d", "month", 0)), key = Seq("id"))
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDS().toDF("id", "ds").select($"id", to_date($"ds").as("d"))
      .writeStream.format("graft")
      .option("path", dir)
      .option("checkpointLocation", TestSpark.tmpDir("sink-part-cp"))
      .outputMode("append").start()
    try {
      mem.addData((1L, "2024-01-05"), (2L, "2024-02-06"))
      q.processAllAvailable()
      val t = graft.table.GraftTable.load(spark, dir)
      assert(t.toDF.count() == 2)
      // epoch files were re-routed through the clustering write: the data
      // dir carries the k=v month layout, so transform pruning works
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName == "data").flatMap(_.listFiles()).flatMap(_.listFiles())
        .map(_.getName).toSet
      assert(files.exists(_.contains("2024-01")) && files.exists(_.contains("2024-02")),
        s"expected month k=v dirs, got $files")
      // month-pruned scan sees exactly the matching row
      assert(t.scan($"d" === java.sql.Date.valueOf("2024-01-05")).count() == 1)
    } finally q.stop()
  }

  test("streaming sink: update-mode aggregation upserts by key (MoR)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.types._
    val dir = TestSpark.tmpDir("sink-upsert")
    graft.table.GraftTable.create(spark, dir, StructType(Seq(
      StructField("v", StringType), StructField("n", LongType))),
      key = Seq("v"), formatVersion = 2)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDS().toDF("id", "v")
      .groupBy($"v").agg(count("*").as("n"))
      .writeStream.format("graft")
      .option("path", dir)
      .option("upsertKeys", "v")
      .option("checkpointLocation", TestSpark.tmpDir("sink-upsert-cp"))
      .outputMode("update").start()
    try {
      mem.addData((1L, "x"), (2L, "x"), (3L, "y"))
      q.processAllAvailable()
      mem.addData((4L, "x")) // only x's count changes in this epoch
      q.processAllAvailable()
      val t = graft.table.GraftTable.load(spark, dir)
      // the table holds the LATEST count per key: x upserted twice
      assert(t.toDF.orderBy("v").as[(String, Long)].collect().toSeq ==
        Seq(("x", 3L), ("y", 1L)))
      assert(t.snapshot.op == "rowdelta")
      // update mode only re-emitted x in epoch 2 — y's row was NOT
      // rewritten (two delta commits, the second touching only x)
      assert(t.snapshot.deletes.size == 2)
    } finally q.stop()
  }

  test("dedupStream drops re-delivered ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)] // (event_id, ts_ns)
    val src = mem.toDS().toDF("event_id", "ts")
    val q = StreamOps.dedupStream(src, watermark = "1 hour")
      .writeStream.format("memory").queryName("dedupst").outputMode("append").start()
    try {
      val H = 3600L * 1000000000L // ns
      mem.addData((1L, H), (2L, H), (1L, H + 1)) // 1 re-delivered in-batch
      q.processAllAvailable()
      mem.addData((1L, H + 2), (3L, H + 3)) // 1 re-delivered next batch
      q.processAllAvailable()
      val ids = spark.table("dedupst").select("event_id")
        .as[Long].collect().toSeq.sorted
      assert(ids == Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("dedupSetStream drops token-set re-arrivals (reorders included), keeps novel docs") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)] // (doc_id, text, ts_ns)
    val src = mem.toDS().toDF("doc_id", "text", "ts")
    val q = StreamOps.dedupSetStream(src, watermark = "1 hour")
      .writeStream.format("memory").queryName("dedupset").outputMode("append").start()
    try {
      val H = 3600L * 1000000000L // ns
      mem.addData(
        (1L, "alpha beta gamma", H),
        (2L, "gamma alpha beta", H + 1), // same token SET, reordered → dropped
        (3L, "alpha beta delta", H + 2)) // one token differs → kept
      q.processAllAvailable()
      mem.addData(
        (4L, "beta alpha gamma gamma", H + 3), // set-identical to doc 1 → dropped
        (5L, "epsilon zeta", H + 4))
      q.processAllAvailable()
      val ids = spark.table("dedupset").select("doc_id")
        .as[Long].collect().toSeq.sorted
      assert(ids == Seq(1L, 3L, 5L), s"got $ids")
    } finally q.stop()
  }

  test("upsert sink: upsertOrderBy makes the latest row win within an epoch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.types._
    val dir = TestSpark.tmpDir("sink-ord")
    graft.table.GraftTable.create(spark, dir, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("ts", LongType))), key = Seq("k"), formatVersion = 2)
    val mem = MemoryStream[(Long, String, Long)]
    // append-mode passthrough: a CDC feed can emit one key many times
    // per epoch; upsertOrderBy picks the greatest ts
    val q = mem.toDS().toDF("k", "v", "ts")
      .writeStream.format("graft")
      .option("path", dir)
      .option("upsertKeys", "k").option("upsertOrderBy", "ts")
      .option("checkpointLocation", TestSpark.tmpDir("sink-ord-cp"))
      .outputMode("append").start()
    try {
      mem.addData((1L, "old", 10L), (1L, "new", 20L), (2L, "b", 5L))
      q.processAllAvailable()
      mem.addData((1L, "stale-late", 15L)) // later epoch still upserts (by key)
      q.processAllAvailable()
      val t = graft.table.GraftTable.load(spark, dir)
      // epoch 1 kept ts=20 for k=1; epoch 2's row replaced it (per-key
      // upsert across epochs is last-writer-wins, ordering is per-epoch)
      assert(t.toDF.orderBy("k").as[(Long, String, Long)].collect().toSeq ==
        Seq((1L, "stale-late", 15L), (2L, "b", 5L)))
    } finally q.stop()
  }

  test("commitStreamEpoch is idempotent for a retried epoch") {
    import org.apache.spark.sql.types._
    val dir = TestSpark.tmpDir("epoch")
    val t = graft.table.GraftTable.create(spark, dir, StructType(Seq(
      StructField("id", LongType))))
    t.append(Seq(1L).toDF("id"))
    val sub = "data/retry-test"
    // first commit of epoch 5 lands; the retry is refused
    new java.io.File(s"$dir/$sub").mkdirs()
    Seq(2L).toDF("id").write.mode("overwrite")
      .parquet(s"$dir/$sub") // physical name == logical here (no renames)
    assert(t.commitStreamEpoch("q1", 5L, sub, 1L, replace = false))
    val v = t.currentVersion
    assert(!t.commitStreamEpoch("q1", 5L, sub, 1L, replace = false))
    assert(!t.commitStreamEpoch("q1", 4L, sub, 1L, replace = false))
    assert(t.currentVersion == v)
    // a later epoch still commits, and the ledger survives the log round-trip
    assert(t.commitStreamEpoch("q1", 6L, sub, 1L, replace = false))
    val reloaded = graft.table.GraftTable.load(spark, dir)
    assert(reloaded.snapshot.streamEpochs("q1") == 6L)
  }

  test("streamIngest: quality gate drops shorts, set-dedup drops rewrites, " +
    "finalized windows carry admitted counts only") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, Long)]
    val docs = mem.toDF.toDF("doc_id", "lang", "text", "ts")
    val q = StreamOps.streamIngest(docs, minTokens = 5, watermark = "1 hour")
      .writeStream.format("memory").queryName("ingest").outputMode("append").start()
    try {
      val ns = 1000000000L // seconds → ns
      mem.addData(
        (1L, "en", "alpha beta gamma delta epsilon", 100L * ns),
        (2L, "en", "beta alpha gamma epsilon delta alpha", 200L * ns), // same token SET as 1 → dedup
        (3L, "en", "too short", 300L * ns),                            // quality-rejected
        (4L, "de", "eins zwei drei vier fuenf sechs", 400L * ns),
        (5L, "en", "one two three four five six seven", 500L * ns))
      q.processAllAvailable()
      // advance the watermark far past hour 0 so its windows finalize
      mem.addData((9L, "en", "way later doc with enough tokens", 20000L * ns))
      q.processAllAvailable()
      val rows = spark.table("ingest").collect()
        .map(r => (r.getAs[Long]("window_start_us"), r.getAs[String]("lang"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"))).toSet
      // hour-0 window: en admits docs 1 (5 toks) and 5 (7 toks) — 2 is a
      // set-duplicate of 1, 3 fails the gate; de admits doc 4 (6 toks)
      assert(rows.contains((0L, "en", 2L, 12L)), s"got $rows")
      assert(rows.contains((0L, "de", 1L, 6L)), s"got $rows")
      assert(!rows.exists(r => r._1 == 0L && r._2 == "en" && r._3 > 2L),
        "duplicate or rejected docs leaked into the admitted counts")
    } finally q.stop()
  }

  test("sessionize: a late-but-within-watermark event widens the session, " +
    "never shrinks it") {
    // regression: the merge branch set end = t unconditionally, so a late
    // arrival moved the session end BELOW its start and fired the gap
    // timeout early
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val src = mem.toDS().toDF("event_id", "ts", "utag")
      .withColumn("user_id", when($"utag" === "a", 1L).otherwise(2L))
    val q = StreamOps.sessionize(spark, src)
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      val ns = 1000000000L
      // batch 1: events at t=1000s and t=1300s (one session)
      mem.addData((1L, 1000L * ns, "a"), (2L, 1300L * ns, "a"))
      q.processAllAvailable()
      // batch 2: LATE event at t=1100s (inside the open session, within
      // the 2h watermark) — must only widen/keep the window
      mem.addData((3L, 1100L * ns, "a"))
      q.processAllAvailable()
      // close the session via the gap, then advance the watermark
      mem.addData((4L, (1300L + 7200L) * ns, "a"))
      q.processAllAvailable()
      mem.addData((5L, (1300L + 7200L * 4) * ns, "a"))
      q.processAllAvailable()
      val rows = spark.table("late_sessions")
        .as[StreamOps.SessionOut].collect().filter(_.user_id == 1L)
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.session_end_us >= r.session_start_us,
          s"session shrank below its start: $r")
      }
      val first = rows.minBy(_.session_start_us)
      assert(first.session_start_us == 1000L * 1000000L &&
        first.session_end_us == 1300L * 1000000L && first.n_events == 3,
        s"late event did not fold into the open session: $first")
    } finally q.stop()
  }

  test("streamHeavyHitters: complete-mode sketch candidates cover every " +
    "true heavy item and match the batch sketch guarantee") {
    graft.functions.HeavyHitterFunctions.register(spark)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)] // (lang, source)
    // skewed feed across two batches: src0 is heavy in en, src9 in de
    mem.addData(Seq.fill(30)(("en", "src0")) ++ (1 to 10).map(i => ("en", s"src$i")): _*)
    mem.addData(Seq.fill(25)(("de", "src9")) ++ (1 to 10).map(i => ("de", s"s$i")): _*)
    val k = 8
    val q = StreamOps.streamHeavyHitters(
        mem.toDF.toDF("lang", "source"), "lang", "source", k)
      .writeStream.format("memory").queryName("shh").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("shh").collect()
        .map(r => r.getAs[String]("group") ->
          (r.getSeq[String](r.fieldIndex("candidates")), r.getAs[Long]("n_total"))).toMap
      assert(rows.keySet == Set("en", "de"))
      // MG guarantee: candidates ⊇ every item with freq > N/k — src0 is
      // 30/40 of en (>N/8), src9 is 25/35 of de
      assert(rows("en")._1.contains("src0") && rows("en")._2 == 40L)
      assert(rows("de")._1.contains("src9") && rows("de")._2 == 35L)
      // bounded state: at most k candidates per group ever emitted
      rows.values.foreach { case (cands, _) => assert(cands.length <= k) }
      // batch parity: the same data through the batch sketch expression
      // yields candidate sets honoring the same guarantee
      val batch = StreamOps.streamHeavyHitters(
        (Seq.fill(30)(("en", "src0")) ++ (1 to 10).map(i => ("en", s"src$i")) ++
          Seq.fill(25)(("de", "src9")) ++ (1 to 10).map(i => ("de", s"s$i")))
          .toDF("lang", "source"), "lang", "source", k).collect()
        .map(r => r.getAs[String]("group") -> r.getSeq[String](r.fieldIndex("candidates"))).toMap
      assert(batch("en").contains("src0") && batch("de").contains("src9"))
    } finally q.stop()
  }
}
