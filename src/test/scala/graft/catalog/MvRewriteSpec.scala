package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable
import graft.streaming.StreamOps

/** Transparent aggregate-MV rewrite (the serving half of the
  * incremental-MV loop): a `GROUP BY g` aggregate over a base table that
  * registered a maintained MV is answered from the MV table when the
  * freshness stamp proves no content-changing base commit postdates it;
  * every other case — staleness, compaction, rollback, time travel,
  * missing `nn`, type mismatch, kill switch — must fall through to the
  * base scan with correct values. Soundness law throughout: the rewrite
  * may change the PLAN, never the ANSWER. */
class MvRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var prior: Option[SparkSession] = None
  lazy val spark: SparkSession = {
    prior = SparkSession.getDefaultSession
    prior.foreach(_ => {
      SparkSession.clearDefaultSession(); SparkSession.clearActiveSession()
    })
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftSparkSessionExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  import spark.implicits._

  override def afterAll(): Unit = prior.foreach { p =>
    SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p)
  }

  lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_mvr_wh").toString
    GraftCatalog.register(spark, wh)
    wh
  }

  private val dec18 = DecimalType(18, 2)
  private val baseSchema = StructType(Seq(
    StructField("id", LongType), StructField("g", StringType),
    StructField("v", dec18)))
  private val mvSchema = StructType(Seq(
    StructField("g", StringType), StructField("n", LongType),
    StructField("nn", LongType), StructField("total", DecimalType(28, 2))))

  private def rows(t: (Long, String, String)*): DataFrame =
    t.toSeq.toDF("id", "g", "v").select(col("id"), col("g"),
      col("v").cast(dec18).as("v"))

  /** Fold the base changelog (from the version last folded) into the MV
    * through the production maintenance step; returns the new high-water
    * version. */
  private def maintain(base: GraftTable, mvDir: String, from: Int,
                       batchId: Long): Int = {
    val to = base.snapshot.version
    StreamOps.applyMvDeltas(base.changesBetween(from, to), mvDir,
      "g", "v", s"mvr-spec-$mvDir", batchId)
    to
  }

  private def scannedPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.rootPaths.map(_.toString)
          case _ => Seq(l.simpleString(100))
        }
      case o => Seq(o.simpleString(100))
    }

  private def usesMv(df: DataFrame, mvTag: String, baseTag: String): Boolean = {
    val p = scannedPaths(df)
    p.exists(_.contains(mvTag)) && !p.exists(_.contains(baseTag))
  }
  private def usesBase(df: DataFrame, mvTag: String, baseTag: String): Boolean = {
    val p = scannedPaths(df)
    p.exists(_.contains(baseTag)) && !p.exists(_.contains(mvTag))
  }

  /** The reference recompute over the base's CURRENT rows — a plain
    * parquet-path DataFrame, never eligible for the rewrite. */
  private def recompute(base: GraftTable): Set[(String, Long, Any)] =
    base.toDF.groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.get(2))).toSet

  private def served(df: DataFrame): Set[(String, Long, Any)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.get(2))).toSet

  private def setup(name: String): (GraftTable, String, String) = {
    val base = GraftTable.create(spark, s"$warehouse/db/$name", baseSchema,
      key = Seq("id"), formatVersion = 2)
    val mvDir = s"$warehouse/db/${name}_mv"
    GraftTable.create(spark, mvDir, mvSchema, key = Seq("g"), formatVersion = 2)
    (base, mvDir, s"SELECT g, count(*) AS n, sum(v) AS s FROM graft.db.$name GROUP BY g")
  }

  test("fresh MV serves the GROUP BY from the MV table; values equal a recompute") {
    val (base, mvDir, sql) = setup("m1")
    base.append(rows((1L, "a", "1.50"), (2L, "a", "2.25"), (3L, "b", "10.00")))
    maintain(base, mvDir, 0, 1)
    base.registerMv("by_g", mvDir, "g", "v")
    val q = spark.sql(sql)
    assert(usesMv(q, "m1_mv", "db/m1/"), s"expected MV scan, got ${scannedPaths(q)}")
    assert(served(q) == recompute(base))
    // single-output projections rewrite too
    val cq = spark.sql("SELECT g, count(*) AS n FROM graft.db.m1 GROUP BY g")
    assert(usesMv(cq, "m1_mv", "db/m1/"))
    assert(cq.as[(String, Long)].collect().toSet == Set(("a", 2L), ("b", 1L)))
  }

  test("all-NULL value group serves SQL-exact NULL sum (the nn column)") {
    val (base, mvDir, sql) = setup("m2")
    base.append(rows((1L, "a", "1.00")).unionAll(
      Seq((2L, "c"), (3L, "c")).toDF("id", "g")
        .select(col("id"), col("g"), lit(null).cast(dec18).as("v"))))
    maintain(base, mvDir, 0, 1)
    base.registerMv("by_g", mvDir, "g", "v")
    val q = spark.sql(sql)
    assert(usesMv(q, "m2_mv", "db/m2/"))
    assert(served(q) == recompute(base)) // c -> (2, null)
    assert(q.filter(col("g") === "c").select(col("s")).head.isNullAt(0))
    // a later non-null value for the group flips nn>0: sum becomes real
    base.append(rows((4L, "c", "3.00")))
    maintain(base, mvDir, base.snapshot.version - 1, 2)
    val q2 = spark.sql(sql)
    assert(usesMv(q2, "m2_mv", "db/m2/"))
    assert(served(q2) == recompute(base))
  }

  test("content-changing base commit makes the MV stale: scan serves, values current") {
    val (base, mvDir, sql) = setup("m3")
    base.append(rows((1L, "a", "1.00")))
    maintain(base, mvDir, 0, 1)
    base.registerMv("by_g", mvDir, "g", "v")
    assert(usesMv(spark.sql(sql), "m3_mv", "db/m3/"))
    base.append(rows((2L, "b", "5.00"))) // no refold
    val q = spark.sql(sql)
    assert(usesBase(q, "m3_mv", "db/m3/"), s"stale MV must not serve: ${scannedPaths(q)}")
    assert(served(q) == recompute(base))
    // refold: the stamp catches up atomically with the fold and serving resumes
    maintain(base, mvDir, base.snapshot.version - 1, 2)
    val q2 = spark.sql(sql)
    assert(usesMv(q2, "m3_mv", "db/m3/"))
    assert(served(q2) == recompute(base))
  }

  test("content-preserving commits (properties/stats-keys) keep the MV fresh; compaction does not") {
    val (base, mvDir, sql) = setup("m4")
    base.append(rows((1L, "a", "1.00"), (2L, "b", "2.00")))
    maintain(base, mvDir, 0, 1)
    base.registerMv("by_g", mvDir, "g", "v")
    base.setProperties(Map("audit.note" -> "x"))
    base.setStatsKeys(Seq("id"))
    val q = spark.sql(sql)
    assert(usesMv(q, "m4_mv", "db/m4/"),
      s"metadata-only commits must not invalidate: ${scannedPaths(q)}")
    assert(served(q) == recompute(base))
    // compact() commits op=overwrite — indistinguishable from a real
    // overwrite in the log, so the rewrite must decline (conservative)
    base.compact()
    val q2 = spark.sql(sql)
    assert(usesBase(q2, "m4_mv", "db/m4/"))
    assert(served(q2) == recompute(base))
  }

  test("rollback declines; time travel declines; kill switch declines — values always current") {
    val (base, mvDir, sql) = setup("m5")
    base.append(rows((1L, "a", "1.00")))
    val v1 = base.snapshot.version
    base.append(rows((2L, "b", "2.00")))
    maintain(base, mvDir, 0, 1)
    base.registerMv("by_g", mvDir, "g", "v")
    assert(usesMv(spark.sql(sql), "m5_mv", "db/m5/"))
    // time travel must never serve the CURRENT MV
    val tt = spark.sql(s"SELECT g, count(*) AS n, sum(v) AS s " +
      s"FROM graft.db.m5 VERSION AS OF $v1 GROUP BY g")
    assert(usesBase(tt, "m5_mv", "db/m5/"))
    assert(tt.as[(String, Long, BigDecimal)].collect().toSet ==
      Set(("a", 1L, BigDecimal("1.00"))))
    // kill switch
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try assert(usesBase(spark.sql(sql), "m5_mv", "db/m5/"))
    finally spark.conf.unset("spark.graft.mv.rewrite.enabled")
    // rollback commits op=rollback — content may have changed: decline
    base.rollbackTo(v1)
    val q = spark.sql(sql)
    assert(usesBase(q, "m5_mv", "db/m5/"))
    assert(served(q) == recompute(base))
  }

  test("count(value) serves from nn; multi-column GROUP BY serves order-free") {
    // count(v) -> nn on the single-group MV
    val (base, mvDir, _) = setup("m8")
    base.append(rows((1L, "a", "1.00")).unionAll(
      Seq((2L, "a"), (3L, "b")).toDF("id", "g")
        .select(col("id"), col("g"), lit(null).cast(dec18).as("v"))))
    maintain(base, mvDir, 0, 1)
    base.registerMv("by_g", mvDir, "g", "v")
    val cq = spark.sql("SELECT g, count(v) AS nv, count(*) AS n FROM graft.db.m8 GROUP BY g")
    assert(usesMv(cq, "m8_mv", "db/m8/"))
    assert(cq.as[(String, Long, Long)].collect().toSet ==
      Set(("a", 1L, 2L), ("b", 0L, 1L)))
    // two-column grouping: register (g, h), query GROUP BY h, g (reversed)
    val base9 = GraftTable.create(spark, s"$warehouse/db/m9", StructType(Seq(
      StructField("id", LongType), StructField("g", StringType),
      StructField("h", StringType), StructField("v", dec18))),
      key = Seq("id"), formatVersion = 2)
    base9.append(Seq((1L, "a", "x", "1.00"), (2L, "a", "y", "2.00"),
      (3L, "a", "x", "4.00")).toDF("id", "g", "h", "v")
      .select(col("id"), col("g"), col("h"), col("v").cast(dec18).as("v")))
    val mv9 = s"$warehouse/db/m9_mv"
    GraftTable.create(spark, mv9, StructType(Seq(
      StructField("g", StringType), StructField("h", StringType),
      StructField("n", LongType), StructField("nn", LongType),
      StructField("total", DecimalType(28, 2)))), key = Seq("g", "h"), formatVersion = 2)
    StreamOps.applyMvDeltas(base9.changesBetween(0, base9.snapshot.version),
      mv9, Seq("g", "h"), "v", "mvr-spec-m9", 1)
    base9.registerMv("by_gh", mv9, Seq("g", "h"), "v")
    val q9 = spark.sql(
      "SELECT h, g, count(*) AS n, sum(v) AS s FROM graft.db.m9 GROUP BY h, g")
    assert(usesMv(q9, "m9_mv", "db/m9/"), s"got ${scannedPaths(q9)}")
    assert(q9.as[(String, String, Long, BigDecimal)].collect().toSet ==
      Set(("x", "a", 2L, BigDecimal("5.00")), ("y", "a", 1L, BigDecimal("2.00"))))
    // a PARTIAL group tuple cannot be served (the MV is at finer grain)
    val qp = spark.sql("SELECT g, count(*) AS n FROM graft.db.m9 GROUP BY g")
    assert(usesBase(qp, "m9_mv", "db/m9/"))
    assert(qp.as[(String, Long)].collect().toSet == Set(("a", 3L)))
  }

  test("SQL front: CREATE MATERIALIZED VIEW seeds+registers; REFRESH folds exactly-once") {
    val base = GraftTable.create(spark, s"$warehouse/db/s1", baseSchema,
      key = Seq("id"), formatVersion = 2)
    base.append(rows((1L, "a", "1.00"), (2L, "a", "2.00"), (3L, "b", "4.00")))
    val g = new graft.sql.GraftSql(spark)
    g.sql("CREATE MATERIALIZED VIEW graft.db.s1_by_g AS " +
      "SELECT g, count(*), count(v), sum(v) FROM graft.db.s1 GROUP BY g")
    val sql = "SELECT g, count(*) AS n, sum(v) AS s FROM graft.db.s1 GROUP BY g"
    val q1 = spark.sql(sql)
    assert(usesMv(q1, "s1_by_g", "db/s1/"), s"got ${scannedPaths(q1)}")
    assert(served(q1) == recompute(base))
    // duplicate create refuses
    intercept[Exception](g.sql("CREATE MATERIALIZED VIEW graft.db.s1_by_g AS " +
      "SELECT g, count(*), sum(v) FROM graft.db.s1 GROUP BY g"))
    // stale -> REFRESH folds the delta and serving resumes
    base.append(rows((4L, "b", "8.00")))
    assert(usesBase(spark.sql(sql), "s1_by_g", "db/s1/"))
    g.sql("REFRESH MATERIALIZED VIEW graft.db.s1_by_g")
    val mvT = GraftTable.load(spark, s"$warehouse/db/s1_by_g")
    val v = mvT.snapshot.version
    g.sql("REFRESH MATERIALIZED VIEW graft.db.s1_by_g") // replay no-ops
    assert(GraftTable.load(spark, s"$warehouse/db/s1_by_g").snapshot.version == v)
    val q2 = spark.sql(sql)
    assert(usesMv(q2, "s1_by_g", "db/s1/"))
    assert(served(q2) == recompute(base))
    // a compacted base breaks changelog expressibility: REFRESH must fall
    // back to the full recompute and still converge
    base.append(rows((5L, "c", "16.00")))
    base.compact()
    g.sql("REFRESH MATERIALIZED VIEW graft.db.s1_by_g")
    val q3 = spark.sql(sql)
    assert(usesMv(q3, "s1_by_g", "db/s1/"), s"got ${scannedPaths(q3)}")
    assert(served(q3) == recompute(base))
    // definition guards: two value columns / non-aggregate shapes refuse
    intercept[Exception](g.sql("CREATE MATERIALIZED VIEW graft.db.bad1 AS " +
      "SELECT g, sum(v), sum(id) FROM graft.db.s1 GROUP BY g"))
    intercept[Exception](g.sql("CREATE MATERIALIZED VIEW graft.db.bad2 AS " +
      "SELECT g, v FROM graft.db.s1"))
    // DROP unregisters and deletes storage; queries fall back to the scan
    g.sql("DROP MATERIALIZED VIEW graft.db.s1_by_g")
    val qd = spark.sql(sql)
    assert(usesBase(qd, "s1_by_g", "db/s1/"))
    assert(served(qd) == recompute(base))
    assert(!GraftTable.exists(spark, s"$warehouse/db/s1_by_g"))
  }

  test("CALL graft.system.refresh_mv is the scheduler-facing REFRESH twin") {
    val base = GraftTable.create(spark, s"$warehouse/db/s4", baseSchema,
      key = Seq("id"), formatVersion = 2)
    base.append(rows((1L, "a", "1.00")))
    val g = new graft.sql.GraftSql(spark)
    g.sql("CREATE MATERIALIZED VIEW graft.db.s4_by_g AS " +
      "SELECT g, count(*), sum(v) FROM graft.db.s4 GROUP BY g")
    base.append(rows((2L, "b", "2.00")))
    val sql = "SELECT g, count(*) AS n, sum(v) AS s FROM graft.db.s4 GROUP BY g"
    assert(usesBase(spark.sql(sql), "s4_by_g", "db/s4/"))
    spark.sql("CALL graft.system.refresh_mv('db.s4_by_g')").collect()
    val q = spark.sql(sql)
    assert(usesMv(q, "s4_by_g", "db/s4/"), s"got ${scannedPaths(q)}")
    assert(served(q) == recompute(base))
    // duplicate CALL no-ops through the ledger
    val v = GraftTable.load(spark, s"$warehouse/db/s4_by_g").snapshot.version
    spark.sql("CALL graft.system.refresh_mv('db.s4_by_g')").collect()
    assert(GraftTable.load(spark, s"$warehouse/db/s4_by_g").snapshot.version == v)
    // a non-MV table refuses
    intercept[Exception](spark.sql("CALL graft.system.refresh_mv('db.s4')").collect())
  }

  test("REFRESH folds MoR rowDeltas: upsert edits and a group drained to zero") {
    val base = GraftTable.create(spark, s"$warehouse/db/s2", baseSchema,
      key = Seq("id"), formatVersion = 2)
    base.append(rows((1L, "a", "1.00"), (2L, "a", "2.00"), (3L, "b", "4.00")))
    val g = new graft.sql.GraftSql(spark)
    g.sql("CREATE MATERIALIZED VIEW graft.db.s2_by_g AS " +
      "SELECT g, count(*), sum(v) FROM graft.db.s2 GROUP BY g")
    val sql = "SELECT g, count(*) AS n, sum(v) AS s FROM graft.db.s2 GROUP BY g"
    // upsert: move id=2 from group a to b with a new value
    val upd = rows((2L, "b", "10.00"))
    base.rowDelta(upd.select(col("id")), upd, Seq("id"))
    g.sql("REFRESH MATERIALIZED VIEW graft.db.s2_by_g")
    val q1 = spark.sql(sql)
    assert(usesMv(q1, "s2_by_g", "db/s2/"), s"got ${scannedPaths(q1)}")
    assert(served(q1) == recompute(base))
    // drain group a entirely: the fold tombstones it out of the MV
    base.rowDelta(rows((1L, "a", "1.00")).select(col("id")),
      rows().limit(0), Seq("id"))
    g.sql("REFRESH MATERIALIZED VIEW graft.db.s2_by_g")
    val q2 = spark.sql(sql)
    assert(usesMv(q2, "s2_by_g", "db/s2/"))
    assert(served(q2) == recompute(base))
    assert(!q2.collect().exists(_.getString(0) == "a"), "drained group must be absent")
  }

  test("a CDC-tail-maintained MV is immediately servable (streaming folds stamp each batch)") {
    val base = GraftTable.create(spark, s"$warehouse/db/s3", baseSchema,
      key = Seq("id"), formatVersion = 2)
    base.append(rows((1L, "a", "1.00"), (2L, "b", "2.00")))   // v1
    val mvDir = s"$warehouse/db/s3_mv"
    GraftTable.create(spark, mvDir, mvSchema, key = Seq("g"), formatVersion = 2)
    StreamOps.applyMvDeltas(base.changesBetween(0, 1), mvDir, "g", "v", "s3-tail", 0L)
    base.append(rows((3L, "a", "4.00")))                       // v2
    val upd = rows((2L, "b", "20.00"))
    base.rowDelta(upd.select(col("id")), upd, Seq("id"))       // v3 upsert
    // the production tail: one batch per commit, each fold stamps the MV
    val q = spark.readStream.format("graft")
      .option("changesFrom", 1).option("maxVersionsPerBatch", 1)
      .load(base.dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        StreamOps.applyMvDeltas(batch, mvDir, "g", "v", "s3-tail", batchId + 1)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    // registration is the only post-stream commit (content-preserving):
    // the stream's own stamps make the MV fresh with no extra refresh
    base.registerMv("by_g", mvDir, "g", "v")
    val served1 = spark.sql("SELECT g, count(*) AS n, sum(v) AS s FROM graft.db.s3 GROUP BY g")
    assert(usesMv(served1, "s3_mv", "db/s3/"), s"got ${scannedPaths(served1)}")
    assert(served(served1) == recompute(base))
  }

  test("shape/type guards: filters, non-sum aggs, legacy MV without nn all decline") {
    val (base, mvDir, sql) = setup("m6")
    base.append(rows((1L, "a", "1.00"), (2L, "b", "2.00")))
    maintain(base, mvDir, 0, 1)
    base.registerMv("by_g", mvDir, "g", "v")
    assert(usesMv(spark.sql(sql), "m6_mv", "db/m6/"))
    // a WHERE under the aggregate: the MV cannot answer it
    val f = spark.sql("SELECT g, count(*) AS n, sum(v) AS s FROM graft.db.m6 " +
      "WHERE id > 1 GROUP BY g")
    assert(usesBase(f, "m6_mv", "db/m6/"))
    assert(f.as[(String, Long, BigDecimal)].collect().toSet ==
      Set(("b", 1L, BigDecimal("2.00"))))
    // an aggregate the MV does not hold
    val a = spark.sql("SELECT g, max(v) AS mx FROM graft.db.m6 GROUP BY g")
    assert(usesBase(a, "m6_mv", "db/m6/"))
    // legacy (g, n, total) MV without nn: registration present but the
    // rewrite requires nn for SQL-exact sum — declines, values current
    val legacyDir = s"$warehouse/db/m6_legacy_mv"
    GraftTable.create(spark, legacyDir, StructType(Seq(
      StructField("g", StringType), StructField("n", LongType),
      StructField("total", DecimalType(28, 2)))), key = Seq("g"), formatVersion = 2)
    StreamOps.applyMvDeltas(base.changesBetween(0, base.snapshot.version),
      legacyDir, "g", "v", "mvr-spec-legacy", 1)
    val base7 = GraftTable.create(spark, s"$warehouse/db/m7", baseSchema,
      key = Seq("id"), formatVersion = 2)
    base7.append(rows((1L, "a", "1.00")))
    base7.registerMv("by_g", legacyDir, "g", "v")
    // stamp the legacy MV fresh by hand to isolate the nn guard
    GraftTable.load(spark, legacyDir).setProperties(
      Map(GraftTable.MvBaseVersionProp -> base7.snapshot.version.toString))
    val q = spark.sql("SELECT g, count(*) AS n, sum(v) AS s FROM graft.db.m7 GROUP BY g")
    assert(usesBase(q, "m6_legacy_mv", "db/m7/"))
    assert(q.as[(String, Long, BigDecimal)].collect().toSet ==
      Set(("a", 1L, BigDecimal("1.00"))))
  }
}
