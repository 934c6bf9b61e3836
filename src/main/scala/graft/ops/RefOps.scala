package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.table._
import graft.dml._
import Tables._

/** Reference-parity operators (SURVEY.md §2), each as a pure harness
  * query over the driver testdata plus an equivalent DuckDB oracle.
  * DML operators are declared as state-transition queries: build a
  * GraftTable in a temp dir from `customer`, apply the DML through the
  * real table layer (write + snapshot commit + read), return the final
  * state; the oracle expresses the same final state as a pure SELECT. */
object RefOps {

  // S1 — JSON-lines source with schema inference (Setup.java:56-60)
  private def scanJsonInfer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = Seq(
      """{"name":"User-1", "age":1122}""",
      """{"name":"User-2", "age":1130}""",
      """{"name":"User-3", "age":1119}""").toDS()
    spark.read.json(ds).select(col("age"), col("name")).orderBy("age")
  }

  // pushdown showcase: filter + projection reach the parquet scan
  private def scanFilterProject(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .filter(col("l_shipdate") < lit(java.time.LocalDateTime.parse("1995-06-01T00:00:00"))
        && col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // P1/U1/X1 — literal projections + UNION ALL + to_date (IcebergSCD2.java:26-31)
  private def unionLiteralsToDate(spark: SparkSession, dir: String): DataFrame =
    spark.sql(
      """SELECT CAST(1 AS BIGINT) AS customer_id, 'customer_a-V1' AS name,
        |       to_date('2020-01-01','yyyy-MM-dd') AS effective_date
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), 'customer_a-V2', to_date('2020-01-12','yyyy-MM-dd')
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'customer_b-V1', to_date('9999-12-31','yyyy-MM-dd')
        |""".stripMargin)
      // dates leave the query as ISO strings: the comparator sees identical
      // representations regardless of how each engine's DATE maps to pandas
      .select(col("customer_id"), col("name"),
        date_format(col("effective_date"), "yyyy-MM-dd").as("effective_date"))
      .orderBy("customer_id", "effective_date")

  // O1/O2 — global sort + limit (every reference example's show())
  private def orderByLimit(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(100)

  // J1 — inner equi-join with residual predicate (IcebergSCD2.java:57-58)
  private def innerJoinResidual(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val o = orders(spark, dir)
    // dimension side broadcast: at any scale, customer << lineitem-sized facts
    broadcast(c).join(o,
        c("c_custkey") === o("o_custkey") && o("o_orderstatus") === "F", "inner")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  // M2 — explicit-clause MERGE as a state transition on `customer`
  private def mergeExplicit(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir)
    val target = cust.select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"), col("c_acctbal").as("acctbal"))
    val source = cust.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("customer_id"),
        concat(col("c_name"), lit("-updated")).as("name"),
        (col("c_acctbal") + 100.0).as("acctbal"))
      .unionAll(cust.filter(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 1000000L).as("customer_id"),
          concat(col("c_name"), lit("-new")).as("name"), col("c_acctbal").as("acctbal")))
    val t = GraftTable.create(spark, tmp("merge_explicit"), target.schema)
    t.append(target)
    t.merge(source, Seq("customer_id"),
      Seq(UpdateClause(Map("name" -> col("s.name"), "acctbal" -> col("s.acctbal")))),
      Seq(InsertClause(Map("customer_id" -> col("s.customer_id"),
        "name" -> col("s.name"), "acctbal" -> col("s.acctbal")))))
    t.toDF.orderBy("customer_id")
  }

  // M4 — MERGE with matched-clause guard (late-data CDC)
  private def mergeGuard(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir)
    val target = cust.select(col("c_custkey").as("customer_id"), col("c_name").as("name"),
      (col("c_custkey") % 5).cast(IntegerType).as("rts"))
    val source = cust.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("customer_id"),
        concat(col("c_name"), lit("-u")).as("name"), lit(3).cast(IntegerType).as("rts"))
    MergePlanner.merge(target, source, Seq("customer_id"),
      Seq(UpdateClause(Map("name" -> col("s.name"), "rts" -> col("s.rts")),
        cond = Some(col("t.rts") < col("s.rts")))),
      Seq(InsertAllClause()))
      .orderBy("customer_id")
  }

  // M3 + D4 — star merge interacting with schema evolution
  private def mergeStarEvolve(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir)
    val target = cust.select(col("c_custkey").as("customer_id"), col("c_name").as("name"))
    val source = cust.filter(col("c_custkey") % 4 === 0)
      .select(col("c_custkey").as("customer_id"),
        concat(col("c_name"), lit("-s")).as("name"), col("c_mktsegment").as("segment"))
    val t = GraftTable.create(spark, tmp("merge_star"), target.schema)
    t.append(target)
    // pre-evolution: extra source column `segment` is ignored (reference
    // runs SET */INSERT * with an extra source column before ADD COLUMN)
    t.merge(source, Seq("customer_id"), Seq(UpdateAllClause()), Seq(InsertAllClause()))
    t.addColumn("segment", StringType)
    // post-evolution: same merge now populates the new column
    t.merge(source, Seq("customer_id"), Seq(UpdateAllClause()), Seq(InsertAllClause()))
    t.toDF.orderBy("customer_id")
  }

  // M1 — DELETE FROM ... WHERE with conjunctive predicate
  private def deleteWhere(spark: SparkSession, dir: String): DataFrame = {
    val target = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"), col("c_acctbal").as("acctbal"),
      col("c_mktsegment").as("mktsegment"))
    val t = GraftTable.create(spark, tmp("delete_where"), target.schema)
    t.append(target)
    t.delete(col("customer_id") % 10 < 3 && col("mktsegment") === "BUILDING")
    t.toDF.orderBy("customer_id")
  }

  // Position-delete MoR DELETE (extension past the reference's equality
  // deletes, IcebergJavaApiUpsert.java): rows die by their (_file,_pos)
  // physical identity — no data rewrite, no key column required.
  private def positionalDelete(spark: SparkSession, dir: String): DataFrame = {
    val target = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"), col("c_acctbal").as("acctbal"))
    val t = GraftTable.create(spark, tmp("positional_delete"), target.schema,
      formatVersion = 2)
    t.append(target)
    t.deleteWherePositional(col("customer_id") % 7 === 0)
    t.toDF.orderBy("customer_id")
  }

  // M5 — the SCD2 pipeline (flagship; IcebergSCD2.java:51-68)
  def scd2Pipeline(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"))
    val dimOpen = cust.select(col("customer_id"), col("name"),
      lit(true).as("is_current"),
      to_date(lit("2020-01-01")).as("effective_date"),
      to_date(lit("9999-12-31")).as("end_date"))
    val dimClosed = cust.filter(col("customer_id") % 4 === 0)
      .select(col("customer_id"), concat(col("name"), lit("-V0")).as("name"),
        lit(false).as("is_current"),
        to_date(lit("2019-06-01")).as("effective_date"),
        to_date(lit("2020-01-01")).as("end_date"))
    val t = GraftTable.create(spark, tmp("scd2"), dimOpen.schema)
    t.append(dimOpen.unionAll(dimClosed))

    val stg = cust.filter(col("customer_id") % 3 === 0)
      .select(col("customer_id"), concat(col("name"), lit("-V2")).as("name"),
        to_date(lit("2020-02-15")).as("effective_date"))

    // merge source = UNION ALL(new open rows, close-out rows), exactly the
    // reference's inline view (IcebergSCD2.java:53-58)
    val dim = t.toDF
    val openRows = stg.select(col("customer_id"), col("name"), col("effective_date"),
      to_date(lit("9999-12-31")).as("end_date"))
    val closeRows = stg.as("s").join(dim.as("d"),
        col("s.customer_id") === col("d.customer_id") && col("d.is_current"), "inner")
      .select(col("d.customer_id").as("customer_id"), col("d.name").as("name"),
        col("d.effective_date").as("effective_date"),
        col("s.effective_date").as("end_date"))
    val source = openRows.unionAll(closeRows)

    t.merge(source, Seq("customer_id", "effective_date"),
      Seq(UpdateClause(Map("is_current" -> lit(false), "end_date" -> col("s.end_date")))),
      Seq(InsertClause(Map(
        "customer_id" -> col("s.customer_id"), "name" -> col("s.name"),
        "is_current" -> lit(true), "effective_date" -> col("s.effective_date"),
        "end_date" -> col("s.end_date")))))
    t.toDF
      .select(col("customer_id"), col("name"), col("is_current"),
        date_format(col("effective_date"), "yyyy-MM-dd").as("effective_date"),
        date_format(col("end_date"), "yyyy-MM-dd").as("end_date"))
      .orderBy("customer_id", "effective_date")
  }

  // K7/M6 — merge-on-read equality-delete upsert through the table layer
  private def rowdeltaUpsert(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir)
    val base = cust.select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"), col("c_acctbal").as("acctbal"))
    val t = GraftTable.create(spark, tmp("rowdelta"), base.schema, key = Seq("customer_id"))
    t.append(base)
    t.upgradeFormat(2)
    val hit = cust.filter(col("c_custkey") % 5 === 0)
    t.rowDelta(
      hit.select(col("c_custkey").as("customer_id")),
      hit.select(col("c_custkey").as("customer_id"),
        concat(col("c_name"), lit("-v2")).as("name"),
        (col("c_acctbal") + 50.0).as("acctbal")),
      Seq("customer_id"))
    t.toDF.orderBy("customer_id")
  }

  // D4/D5 — add column (old rows null) then drop column (projected away)
  private def schemaAddDrop(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir)
    val batch1 = cust.select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"), col("c_acctbal").as("acctbal"))
    val t = GraftTable.create(spark, tmp("schema_evolve"), batch1.schema)
    t.append(batch1)
    t.addColumn("segment", StringType)
    val batch2 = cust.filter(col("c_custkey") % 2 === 0)
      .select((col("c_custkey") + 2000000L).as("customer_id"), col("c_name").as("name"),
        lit(null).cast(DoubleType).as("acctbal"), col("c_mktsegment").as("segment"))
    t.append(batch2)
    t.dropColumn("acctbal")
    t.toDF.orderBy("customer_id")
  }

  // D3/D9 — partition transform write + per-partition counts
  private def partitionTransform(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
      col("o_totalprice"), col("o_orderdate"))
    val t = GraftTable.create(spark, tmp("partitioned"), o.schema,
      spec = Seq(PartitionField("o_orderdate", "month")))
    t.append(o)
    t.toDF.select(t.partitionPathExpr.as("part"))
      .groupBy("part").agg(count(lit(1)).as("n"))
      .orderBy("part")
  }

  // D9/S2 at the metadata plane — metadata-only aggregate folds: GROUP
  // BY on identity partition columns and a partition-equality filtered
  // count answer at ANALYSIS time from the per-leaf pstats sidecars
  // (GraftPartitionFold), and the third branch folds count(col) /
  // min / max from the per-dir bounds+nn sidecars (GraftCountFold) —
  // no data file is opened for any branch, the role Iceberg's manifest
  // stats play at 100 TB. Fold firing (LocalRelation plan, decline
  // paths) is asserted by PartitionCountFoldSpec/CountFoldSpec; this
  // query grades result parity against the raw-parquet oracle across
  // two commits' worth of leaves.
  private def partitionCountFold(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir).select(col("o_orderkey"), col("o_orderstatus"),
      col("o_orderpriority"), expr("nullif(o_orderstatus, 'F')").as("status_opt"))
    val wh = tmp("pcf_wh")
    val cat = s"graftpc${java.util.UUID.randomUUID().toString.take(8)}"
    graft.catalog.GraftCatalog.register(spark, wh, cat)
    val t = GraftTable.create(spark, s"$wh/db/ord", o.schema,
      spec = Seq(PartitionField("o_orderpriority", "identity"),
        PartitionField("o_orderstatus", "identity")),
      statsKeys = Seq("o_orderkey", "status_opt"))
    t.append(o.filter(col("o_orderkey") % 2 === 0))
    t.append(o.filter(col("o_orderkey") % 2 =!= 0))
    spark.sql(
      s"""SELECT o_orderpriority, count(*) AS n FROM $cat.db.ord
         |GROUP BY o_orderpriority
         |UNION ALL
         |SELECT 'F-filtered' AS o_orderpriority, count(*) AS n FROM $cat.db.ord
         |WHERE o_orderstatus = 'F'
         |UNION ALL
         |SELECT 'stats-fold' AS o_orderpriority, c + lo + hi + s AS n FROM
         |  (SELECT count(status_opt) AS c, min(o_orderkey) AS lo,
         |          max(o_orderkey) AS hi, sum(o_orderkey) AS s FROM $cat.db.ord)
         |UNION ALL
         |SELECT 'scoped-' || o_orderpriority AS o_orderpriority, lo + hi + m + s AS n FROM
         |  (SELECT o_orderpriority, min(o_orderkey) AS lo, max(o_orderkey) AS hi,
         |          count(*) AS m, sum(o_orderkey) AS s FROM $cat.db.ord
         |   WHERE o_orderstatus = 'F' GROUP BY o_orderpriority)
         |ORDER BY o_orderpriority""".stripMargin)
  }

  // ANALYZE-style backfill graded end-to-end: the table's history
  // predates its stats configuration, so the fold sidecars don't exist;
  // `CALL graft.system.capture_stats` builds them (bounds+nn, pcolstats)
  // without touching committed data, after which the partition-scoped
  // rollup serves from metadata. Fold firing and decline paths are
  // asserted by StatsBackfillSpec; this grades result parity.
  private def statsBackfill(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
    val wh = tmp("sbf_wh")
    val cat = s"graftsb${java.util.UUID.randomUUID().toString.take(8)}"
    graft.catalog.GraftCatalog.register(spark, wh, cat)
    val t = GraftTable.create(spark, s"$wh/db/cust", c.schema,
      spec = Seq(PartitionField("c_mktsegment", "identity")))
    t.append(c.filter(col("c_custkey") % 2 === 0))
    t.append(c.filter(col("c_custkey") % 2 =!= 0))
    spark.sql(s"ALTER TABLE $cat.db.cust SET TBLPROPERTIES " +
      "('graft.stats-keys' = 'c_custkey')")
    spark.sql(s"CALL $cat.system.capture_stats('db.cust')")
    spark.sql(
      s"""SELECT c_mktsegment, count(*) AS n, min(c_custkey) AS lo,
         |       max(c_custkey) AS hi
         |FROM $cat.db.cust GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  /** Iceberg-spec bucket golden vectors (VERDICT r7 item 7): the
    * `ibucket` transform's [[graft.functions.IcebergBucket]] expression
    * over the exact typed literals of the Iceberg spec's Appendix B test
    * table (int/long 34, string "iceberg", binary 0x00010203, date
    * 2017-11-16, timestamp 2017-11-16T22:31:08, decimal 14.20), bucketed
    * under two coprime counts. The DuckDB oracle does NOT reimplement
    * murmur3 — it derives the expected buckets arithmetically from the
    * PUBLISHED 32-bit hash constants, so this is an external anchor:
    * byte-layout or mixer drift breaks the hash match. `dir` unused. */
  private def icebergBucketVectors(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftShim
    def ib(c: Column, n: Int): Column = GraftShim.column(
      graft.functions.IcebergBucket(GraftShim.expression(c), n))
    val inputs: Seq[(String, Column)] = Seq(
      "binary" -> lit(Array[Byte](0, 1, 2, 3)),
      "date" -> to_date(lit("2017-11-16")),
      "decimal" -> lit(new java.math.BigDecimal("14.20")),
      "int" -> lit(34),
      "long" -> lit(34L),
      "string" -> lit("iceberg"),
      "timestamp" -> to_timestamp(lit("2017-11-16 22:31:08")))
    val rows = for { (nm, c) <- inputs; n <- Seq(16, 997) } yield
      struct(lit(nm).as("name"), lit(n).as("n"), ib(c, n).as("bucket"))
    spark.range(1).select(explode(array(rows: _*)).as("kv"))
      .select(col("kv.name").as("name"), col("kv.n").as("n"),
        col("kv.bucket").as("bucket"))
      .orderBy("name", "n")
  }

  private val icebergBucketVectorsOracle: String =
    """WITH v AS (SELECT * FROM (VALUES
      |  ('binary',    CAST(-188683207 AS BIGINT)),
      |  ('date',      CAST(-653330422 AS BIGINT)),
      |  ('decimal',   CAST(-500754589 AS BIGINT)),
      |  ('int',       CAST(2017239379 AS BIGINT)),
      |  ('long',      CAST(2017239379 AS BIGINT)),
      |  ('string',    CAST(1210000089 AS BIGINT)),
      |  ('timestamp', CAST(-2047944441 AS BIGINT))) t(name, h)),
      |n AS (SELECT unnest([16, 997]) AS n)
      |SELECT v.name, CAST(n.n AS INT) AS n,
      |       CAST((v.h & 2147483647) % n.n AS INT) AS bucket
      |FROM v CROSS JOIN n ORDER BY name, n""".stripMargin

  // full-sync merge: WHEN NOT MATCHED BY SOURCE DELETE makes the target
  // mirror the source exactly (the CDC snapshot-sync pattern)
  private def mergeFullSync(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir)
    val target = cust.select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"))
    val source = cust.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("customer_id"),
        concat(col("c_name"), lit("-sync")).as("name"))
    MergePlanner.merge(target, source, Seq("customer_id"),
      matched = Seq(UpdateAllClause()),
      notMatched = Seq(InsertAllClause()),
      notMatchedBySource = Seq(DeleteClause()))
      .orderBy("customer_id")
  }

  // time travel (VERSION AS OF) over the snapshot log: union of counts
  // per historical version after two appends and a delete
  private def timeTravel(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"))
    val t = GraftTable.create(spark, tmp("time_travel"), cust.schema)
    t.append(cust)                                     // v1
    t.append(cust.filter(col("customer_id") % 2 === 0)) // v2
    t.delete(col("customer_id") % 3 === 0)             // v3 (overwrite)
    // all three historical counts in ONE Spark job (union of dfAt frames),
    // not three sequential driver-side count() round trips; the literal
    // versions frame left-joins the counts so an EMPTY historical
    // snapshot still yields its (version, 0) row
    import spark.implicits._
    val versions = Seq(1L, 2L, 3L).toDF("version")
    val counts = Seq(1, 2, 3).map(v =>
        t.asOf(v).select(lit(v.toLong).as("version")))
      .reduce(_ unionAll _)
      .groupBy("version").agg(count(lit(1)).as("n"))
    versions.join(counts, Seq("version"), "left")
      .select(col("version"), coalesce(col("n"), lit(0L)).as("n_rows"))
      .orderBy("version")
  }

  // Maintenance law: compact + snapshot expiry must preserve the logical
  // table EXACTLY. Builds real physical debt first — three append dirs,
  // a MoR equality-delete group (rowDelta upsert), a predicate delete —
  // then compacts (one dir, zero pending deletes, asserted), expires all
  // but the latest snapshot, and reads the final state through a FRESH
  // load from disk. The oracle recomputes that state from raw customer,
  // so the hash match is the maintenance-preserves-results law itself —
  // the property that makes background compaction safe to run against a
  // live 100 TB table. (Same close-over-storage pattern as
  // corpus_release.)
  private def maintenanceCompact(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir)
    val base = cust.select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"), col("c_acctbal").as("acctbal"))
    val path = tmp("maintenance")
    val t = GraftTable.create(spark, path, base.schema, key = Seq("customer_id"))
    t.append(base.filter(col("customer_id") % 3 === 0))
    t.append(base.filter(col("customer_id") % 3 === 1))
    t.append(base.filter(col("customer_id") % 3 === 2))
    t.upgradeFormat(2)
    val hit = cust.filter(col("c_custkey") % 5 === 0)
    t.rowDelta(
      hit.select(col("c_custkey").as("customer_id")),
      hit.select(col("c_custkey").as("customer_id"),
        concat(col("c_name"), lit("-v2")).as("name"),
        (col("c_acctbal") + 50.0).as("acctbal")),
      Seq("customer_id"))
    // positional (MoR) delete: kills rows WITHOUT rewriting dirs — the
    // COW delete() would defragment as a side effect and leave compact()
    // nothing to prove
    t.deleteWherePositional(col("acctbal") < 0)
    val before = GraftTable.load(spark, path).snapshot
    assert(before.dataDirs.length > 1 && before.deletes.nonEmpty,
      "maintenance demo needs real fragmentation + pending deletes before compacting")
    t.compact()
    val after = GraftTable.load(spark, path).snapshot
    assert(after.dataDirs.length == 1 && after.deletes.isEmpty,
      "compact must leave one clustered dir and no pending delete files")
    t.expireSnapshots(keepLast = 1)
    // fresh load AFTER expiry: the surviving snapshot alone must carry
    // the full logical state
    GraftTable.load(spark, path).toDF
      .select(col("customer_id"), col("name"), col("acctbal"))
      .orderBy("customer_id")
  }

  /** Bin-packing small-file compaction as a graded query (Iceberg's
    * `rewrite_data_files` binPack strategy, spec-deep-covered in
    * GraftTableSpec / RewriteChurnHammerSpec) — the STEADY-STATE
    * maintenance op of a 100 TB deployment, where `compact()`'s full
    * rewrite is not an option: only the long tail of small commits that
    * streaming ingestion leaves behind is folded; large dirs keep their
    * files byte-untouched. Build one LARGE commit plus eight small ones,
    * fold with [[GraftTable.rewriteSmallDirs]], reload FROM DISK. The
    * in-query gates pin the contract: (a) the 8-dir tail folded into
    * one, (b) the large dir's path survived verbatim (its files were
    * never rewritten — at 100 TB that is the difference between an
    * O(tail) nightly job and an O(table) rewrite), (c) a second
    * invocation no-ops at the same threshold (the loop is idempotent at
    * steady state). The oracle recomputes the logical table from raw
    * parquet: bin-packing reclaims file handles, never changes a query
    * result — the law that makes the loop schedulable against live
    * tables. */
  private def rewriteSmallDirsQuery(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"), col("c_acctbal").as("acctbal"))
    val path = tmp("rewrite_small")
    val t = GraftTable.create(spark, path, cust.schema)
    // one large commit (~80% of rows) + the small-commit long tail (the
    // slices partition ALL rows: %10<8, then %10>=8 split by %8)
    t.append(cust.filter(col("customer_id") % 10 < 8))
    (0 until 8).foreach(i => GraftTable.load(spark, path).append(
      cust.filter(col("customer_id") % 10 >= 8 && col("customer_id") % 8 === i)))
    val before = GraftTable.load(spark, path).snapshot
    assert(before.dataDirs.length == 9, s"fixture wants 9 dirs, has ${before.dataDirs.length}")
    // the SAME measurement rewriteSmallDirs bins by (Hadoop content
    // summary — the checksum filesystem hides .crc sidecars that a raw
    // directory walk would count, and a threshold derived from a
    // different ruler mis-bins dirs near the boundary)
    def bytesOf(sub: String): Long = {
      val p = new org.apache.hadoop.fs.Path(s"$path/$sub")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
    }
    val bigPath = before.dataDirs.head.path
    val threshold = bytesOf(bigPath) // strict <: the big dir is NOT small
    assert(before.dataDirs.tail.forall(d => bytesOf(d.path) < threshold),
      "fixture broken: a tail dir is as large as the bulk dir")
    GraftTable.load(spark, path).rewriteSmallDirs(threshold)
    val after = GraftTable.load(spark, path).snapshot
    assert(after.dataDirs.length == 2,
      s"bin-pack must leave [large, folded-tail], has ${after.dataDirs.length}")
    assert(after.dataDirs.exists(_.path == bigPath),
      "bin-pack rewrote the large dir — the whole point is that it must not")
    // steady state: nothing left to fold at the same threshold
    val v = GraftTable.load(spark, path).currentVersion
    GraftTable.load(spark, path).rewriteSmallDirs(threshold)
    assert(GraftTable.load(spark, path).currentVersion == v,
      "second bin-pack pass must no-op (single small dir left)")
    GraftTable.load(spark, path).toDF
      .select(col("customer_id"), col("name"), col("acctbal"))
      .orderBy("customer_id")
  }

  /** Orphan-file sweep as a graded query (Iceberg's
    * `remove_orphan_files`, spec-deep-covered in GraftTableSpec /
    * CrashRecoverySpec): build a live two-commit table, PLANT the
    * residue a 100 TB deployment actually accumulates — a fully-written
    * data dir whose commit never happened (crashed writer) and a stale
    * `staging/` scratch dir — then sweep with
    * [[GraftTable.vacuumOrphans]] and reload FROM DISK. The in-query
    * gate pins the sweep's exact scope: both planted dirs removed, both
    * referenced commits untouched. The oracle recomputes the logical
    * table from raw parquet, so the hash match is the law that makes
    * the sweep schedulable against live tables: vacuum may reclaim
    * storage but may never change a query result. */
  private def vacuumOrphansQuery(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"), col("c_acctbal").as("acctbal"))
    val path = tmp("vacuum")
    val tbl = GraftTable.create(spark, path, cust.schema)
    tbl.append(cust.filter(col("customer_id") % 2 === 0))
    tbl.append(cust.filter(col("customer_id") % 2 === 1))
    // residue of a crashed writer: data written, commit never ran
    cust.limit(50).write.parquet(s"$path/data/orphan-crashed")
    cust.limit(10).write.parquet(s"$path/staging/orphan-scratch")
    // negative grace = "everything is old": the planted dirs are seconds
    // young, and production sweeps use a 3-day grace for exactly that
    // reason — here the POINT is sweeping them
    val removed = GraftTable.load(spark, path).vacuumOrphans(olderThanMs = -1000)
    assert(removed.toSet == Set("data/orphan-crashed", "staging/orphan-scratch"),
      s"vacuum swept the wrong set: $removed")
    val re = GraftTable.load(spark, path)
    assert(re.snapshot.dataDirs.length == 2,
      "vacuum must leave every snapshot-referenced dir untouched")
    re.toDF.select(col("customer_id"), col("name"), col("acctbal"))
      .orderBy("customer_id")
  }

  /** Z-order layout rewrite as a graded query (the Delta/Iceberg
    * `OPTIMIZE ZORDER BY` maintenance op, spec-deep-covered in
    * GraftTableSpec): build a fragmented table (two appends), rewrite
    * with [[GraftTable.rewriteZOrder]] on (p_partkey, p_size), reload
    * FROM DISK, and return every row with its recomputed Morton
    * z-value. The oracle recomputes the identical clamp-normalize +
    * bit-interleave from raw parquet (sign bit via the simhash-oracle
    * Long.MinValue-term convention), so the hash match proves both the
    * rewrite-preserves-the-table law and the interleave semantics
    * bit-for-bit. The in-query gate pins the property the rewrite
    * exists for at 100 TB: `repartitionByRange(__z)` gives the
    * rewritten files PAIRWISE DISJOINT z ranges, so min/max file bounds
    * prune range predicates on EITHER dimension — one sorted layout
    * serving two predicate columns. */
  private def zorderRewrite(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.ZOrderLong.register(spark)
    val p = t(spark, dir, "part")
      .select(col("p_partkey"), col("p_size"), col("p_brand"))
    val path = tmp("zorder")
    val tbl = GraftTable.create(spark, path, p.schema)
    tbl.append(p.filter(col("p_partkey") % 2 === 0))
    tbl.append(p.filter(col("p_partkey") % 2 === 1))
    tbl.rewriteZOrder("p_partkey", "p_size")
    val re = GraftTable.load(spark, path)
    val s = re.snapshot
    assert(s.dataDirs.length == 1,
      "z-order rewrite must leave one clustered dir")
    def norm(c: Column): Column =
      greatest(least(c.cast(LongType), lit(2147483647L)),
        lit(-2147483648L)) + lit(2147483648L)
    val z = graft.functions.ZOrderLong.z_order(
      norm(col("p_partkey")), norm(col("p_size")))
    // layout gate: per-file [min,max] z ranges must not overlap — the
    // range partitioner's contract, and exactly what makes file-bounds
    // pruning work on the clustered table. Metadata-scale collect (one
    // row per file).
    val ranges = spark.read.parquet(s"$path/${s.dataDirs.head.path}")
      .select(input_file_name().as("f"), z.as("z"))
      .groupBy(col("f")).agg(min(col("z")).as("lo"), max(col("z")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi0), (lo1, _)) =>
        assert(hi0 <= lo1,
          s"z-ordered files overlap: [..,$hi0] vs [$lo1,..] — range layout broken")
      case _ => ()
    }
    re.toDF
      .select(col("p_partkey"), col("p_size"), col("p_brand"), z.as("z"))
      .orderBy("z", "p_partkey")
  }

  private def zorderOracle: String = {
    def norm(c: String) =
      s"(GREATEST(LEAST(CAST($c AS BIGINT), 2147483647), -2147483648) + 2147483648)"
    val aTerms = (0 until 32).map(j => s"(((na >> $j) & 1) << ${2 * j})")
      .mkString(" + ")
    val bTerms = (0 until 31).map(j => s"(((nb >> $j) & 1) << ${2 * j + 1})")
      .mkString(" + ")
    s"""WITH p AS (SELECT p_partkey, p_size, p_brand,
       |  ${norm("p_partkey")} AS na, ${norm("p_size")} AS nb FROM part)
       |SELECT p_partkey, p_size, p_brand,
       |  CAST($aTerms + $bTerms
       |    + CASE WHEN ((nb >> 31) & 1) = 1
       |        THEN (-9223372036854775807 - 1) ELSE 0 END AS BIGINT) AS z
       |FROM p ORDER BY z, p_partkey""".stripMargin
  }

  // row-level CDC changelog: inserts read from their commit's data dirs,
  // delete pre-images recovered by a keyed semi-join against the parent
  // snapshot (an upsert reads as delete(old)+insert(new))
  private def changelogRead(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"))
    val t = GraftTable.create(spark, tmp("changelog"), cust.schema,
      key = Seq("customer_id"), formatVersion = 2)
    t.append(cust)                                            // v1: insert all
    val hit = cust.filter(col("customer_id") % 10 === 0)
    t.rowDelta(hit.select(col("customer_id")),                // v2: upsert
      hit.select(col("customer_id"), concat(col("name"), lit("-v2")).as("name")),
      Seq("customer_id"))
    t.changesBetween(0, 2)
      .orderBy("_commit_version", "_change_type", "customer_id")
  }

  // incremental MATERIALIZED-ROLLUP maintenance — the lakehouse pattern
  // the changelog read exists FOR: an aggregate table is kept current by
  // applying insert/delete deltas from changesBetween instead of
  // recomputing from scratch. v1 state seeds the rollup; an append and a
  // rowDelta upsert land; the delta pass folds +row for inserts, −row for
  // delete pre-images into the seeded rollup. The oracle recomputes the
  // FINAL table state directly — a hash match proves incremental
  // maintenance ≡ full recompute (the MV-consistency law). Sums run in
  // DECIMAL so the incremental and recompute paths are exactly
  // associative at any partitioning; at 100 TB the delta pass touches
  // only changed rows, never the base table.
  private def incrementalRollup(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir).select(col("c_custkey").as("id"),
      col("c_mktsegment").as("seg"),
      col("c_acctbal").cast(DecimalType(18, 2)).as("bal"))
    val t = GraftTable.create(spark, tmp("inc_rollup"), cust.schema,
      key = Seq("id"), formatVersion = 2)
    t.append(cust.filter(col("id") % 2 === 0))                       // v1
    // the "existing aggregate table", materialized at v1
    val roll0 = t.toDF.groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(col("bal")).as("total"))
      .localCheckpoint(true)
    t.append(cust.filter(col("id") % 2 === 1 && col("id") % 5 =!= 0)) // v2
    val upd = cust.filter(col("id") % 10 === 2)
      .withColumn("bal", (col("bal") + 100).cast(DecimalType(18, 2)))
    t.rowDelta(upd.select(col("id")), upd, Seq("id"))                 // v3 upsert
    val ch = t.changesBetween(1, 3)
    val sign = when(col("_change_type") === "insert", 1).otherwise(-1)
    val deltas = ch.groupBy(col("seg")).agg(
      sum(sign).cast(LongType).as("dn"),
      sum(col("bal") * sign).as("dtotal"))
    roll0.join(deltas, Seq("seg"), "full_outer")
      .select(col("seg"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_rows"),
        (coalesce(col("total"), lit(BigDecimal(0))) +
          coalesce(col("dtotal"), lit(BigDecimal(0)))).cast(DoubleType).as("total"))
      .filter(col("n_rows") > 0)
      .orderBy("seg")
  }

  // incremental changelog read: only the rows appended after a version
  private def incrementalRead(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"))
    val t = GraftTable.create(spark, tmp("incremental"), cust.schema)
    t.append(cust)                                      // v1
    t.append(cust.filter(col("customer_id") % 2 === 0)
      .withColumn("name", concat(col("name"), lit("-b2")))) // v2
    t.appendsBetween(1, 2).orderBy("customer_id")
  }

  // transform-pruned scan: filter on the SOURCE column of a month
  // transform; the derived-column predicate skips non-matching files
  private def partitionPrunedScan(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
      col("o_totalprice"), col("o_orderdate"))
    val t = GraftTable.create(spark, tmp("pruned_scan"), o.schema,
      spec = Seq(PartitionField("o_orderdate", "month")))
    t.append(o)
    t.scan(col("o_orderdate") >= lit(java.time.LocalDateTime.parse("1997-03-01T00:00:00"))
        && col("o_orderdate") < lit(java.time.LocalDateTime.parse("1997-06-01T00:00:00")))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"))
      .orderBy("month")
  }

  // K3/K1/D1/D2 — the DSv2 catalog write path end-to-end: plain-SQL
  // CREATE TABLE (with a column comment), df.writeTo(...).append()
  // (IcebergJavaApiAppend.java:69), plain-SQL INSERT INTO ... SELECT
  // reading the same catalog table. Everything flows through
  // GraftCatalog/GraftSparkTable — no GraftSql, no direct GraftTable call.
  private def writetoAppend(spark: SparkSession, dir: String): DataFrame = {
    val wh = tmp("writeto_wh")
    // unique catalog name per invocation: CatalogManager caches plugin
    // instances by name, so reusing a name across temp warehouses would
    // serve a stale root (purity under arbitrary query ordering)
    val cat = s"graftwt${java.util.UUID.randomUUID().toString.take(8)}"
    graft.catalog.GraftCatalog.register(spark, wh, cat)
    spark.sql(s"""CREATE TABLE $cat.db.cust (
                 |  customer_id bigint COMMENT 'unique id',
                 |  name string,
                 |  acctbal double)""".stripMargin)
    val base = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"), col("c_acctbal").as("acctbal"))
    base.filter(col("customer_id") % 2 === 0).writeTo(s"$cat.db.cust").append()
    base.filter(col("customer_id") % 2 =!= 0).writeTo(s"$cat.db.cust").append()
    spark.sql(s"""INSERT INTO $cat.db.cust
                 |SELECT customer_id + 3000000, name || '-ins', acctbal
                 |FROM $cat.db.cust WHERE customer_id % 100 = 0""".stripMargin)
    spark.sql(s"SELECT customer_id, name, acctbal FROM $cat.db.cust ORDER BY customer_id")
  }

  // M2/M6 at the plain-SQL surface — delta-based (merge-on-read) UPDATE +
  // MERGE through the catalog: keyed v2 tables commit rowDelta snapshots
  // (one key file + one changed-row file per statement), never a table
  // rewrite, and the two statements CHAIN without a compact between them.
  private def sqlMorDml(spark: SparkSession, dir: String): DataFrame = {
    val wh = tmp("mor_wh")
    val cat = s"graftmr${java.util.UUID.randomUUID().toString.take(8)}"
    graft.catalog.GraftCatalog.register(spark, wh, cat)
    val base = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"), col("c_acctbal").as("acctbal"))
    val t = GraftTable.create(spark, s"$wh/db/cust", base.schema,
      key = Seq("customer_id"), formatVersion = 2)
    t.append(base)
    val src = s"mor_src_${java.util.UUID.randomUUID().toString.take(8)}"
    base.filter(col("customer_id") % 7 === 0)
      .select(col("customer_id"), concat(col("name"), lit("-u")).as("name"),
        (col("acctbal") * 2).as("acctbal"))
      .unionAll(base.filter(col("customer_id") % 50 === 0)
        .select((col("customer_id") + 2000000L).as("customer_id"),
          concat(col("name"), lit("-m")).as("name"), col("acctbal")))
      .createOrReplaceTempView(src)
    spark.sql(s"UPDATE $cat.db.cust SET acctbal = acctbal + 50.0 WHERE customer_id % 5 = 0")
    spark.sql(
      s"""MERGE INTO $cat.db.cust t USING $src s
         |ON t.customer_id = s.customer_id
         |WHEN MATCHED THEN UPDATE SET t.acctbal = s.acctbal
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(GraftTable.load(spark, s"$wh/db/cust").snapshot.op == "rowdelta",
      "SQL DML on a keyed v2 table must take the merge-on-read path")
    spark.sql(s"SELECT customer_id, name, acctbal FROM $cat.db.cust ORDER BY customer_id")
  }

  // M1/M2 at the plain-SQL surface, group-based (copy-on-write) with
  // RUNTIME GROUP FILTERING: an unkeyed table's UPDATE/MERGE rewrite
  // through ReplaceData, but Spark's group-filter subquery (keyed on the
  // `_file` metadata column) prunes the scan to the dirs containing
  // matched rows and the commit swaps ONLY those dirs — asserted
  // in-query. At 100 TB a SQL UPDATE touches the matched dirs, not the
  // table.
  private def sqlCowDml(spark: SparkSession, dir: String): DataFrame = {
    val wh = tmp("cow_wh")
    val cat = s"graftcw${java.util.UUID.randomUUID().toString.take(8)}"
    graft.catalog.GraftCatalog.register(spark, wh, cat)
    val base = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"), col("c_acctbal").as("acctbal"))
    val t = GraftTable.create(spark, s"$wh/db/cust", base.schema) // no key → group-based
    // three dirs holding disjoint residue classes of the key
    t.append(base.filter(col("customer_id") % 4 === 0))
    t.append(base.filter(col("customer_id") % 4 === 1 || col("customer_id") % 4 === 2))
    t.append(base.filter(col("customer_id") % 4 === 3))
    val before = GraftTable.load(spark, s"$wh/db/cust").snapshot.dataDirs.map(_.path)
    spark.sql(s"UPDATE $cat.db.cust SET acctbal = acctbal + 50.0 WHERE customer_id % 4 = 3")
    val mid = GraftTable.load(spark, s"$wh/db/cust").snapshot.dataDirs.map(_.path)
    assert(mid.count(before.contains) == 2,
      "group-filtered UPDATE must keep the two unmatched dirs verbatim")
    val src = s"cow_src_${java.util.UUID.randomUUID().toString.take(8)}"
    base.filter(col("customer_id") % 20 === 0)
      .select(col("customer_id"), col("name"), (col("acctbal") * 3).as("acctbal"))
      .unionAll(base.filter(col("customer_id") % 50 === 0)
        .select((col("customer_id") + 3000000L).as("customer_id"),
          concat(col("name"), lit("-m")).as("name"), col("acctbal")))
      .createOrReplaceTempView(src)
    spark.sql(
      s"""MERGE INTO $cat.db.cust t USING $src s
         |ON t.customer_id = s.customer_id
         |WHEN MATCHED THEN UPDATE SET t.acctbal = s.acctbal
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = GraftTable.load(spark, s"$wh/db/cust").snapshot.dataDirs.map(_.path)
    // %20==0 rows live in the %4==0 dir only: the other two survive
    assert(after.count(mid.contains) >= 2,
      "group-filtered MERGE must keep unmatched dirs verbatim")
    spark.sql(s"SELECT customer_id, name, acctbal FROM $cat.db.cust ORDER BY customer_id")
  }

  // M3 at the plain-SQL surface with AUTOMATIC evolution: `MERGE WITH
  // SCHEMA EVOLUTION` — the source's extra column becomes a catalog
  // AddColumn before clause resolution (the reference runs ALTER TABLE
  // by hand between the two merges; Spark 4's capability folds it in).
  private def sqlMergeEvolve(spark: SparkSession, dir: String): DataFrame = {
    val wh = tmp("mse_wh")
    val cat = s"graftme${java.util.UUID.randomUUID().toString.take(8)}"
    graft.catalog.GraftCatalog.register(spark, wh, cat)
    val base = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"))
    val t = GraftTable.create(spark, s"$wh/db/cust", base.schema)
    t.append(base)
    val src = s"mse_src_${java.util.UUID.randomUUID().toString.take(8)}"
    customer(spark, dir).filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("customer_id"),
        concat(col("c_name"), lit("-u")).as("name"), col("c_acctbal").as("acctbal"))
      .unionAll(customer(spark, dir).filter(col("c_custkey") % 100 === 0)
        .select((col("c_custkey") + 4000000L).as("customer_id"),
          concat(col("c_name"), lit("-i")).as("name"), col("c_acctbal").as("acctbal")))
      .createOrReplaceTempView(src)
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.db.cust t USING $src s
         |ON t.customer_id = s.customer_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.sql(s"SELECT customer_id, name, acctbal FROM $cat.db.cust ORDER BY customer_id")
  }

  // K4 — path-addressed v1 writer surface: df.write.format("graft")
  // .mode(...).save(path) then spark.read.format("graft").load(path)
  // (SparkTestWrite.java:48-50); both writes commit snapshots, the read
  // resolves through the DataSource registration.
  private def formatSaveRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = tmp("fmt_save")
    val base = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"), col("c_acctbal").as("acctbal"))
    base.write.format("graft").mode("append").save(path)
    base.filter(col("customer_id") % 100 === 0)
      .withColumn("name", concat(col("name"), lit("-dup")))
      .write.format("graft").mode("append").save(path)
    spark.read.format("graft").load(path)
      .orderBy("customer_id", "name")
  }

  // Storage-partitioned join: customer/orders bucketed on custkey with the
  // same count join WITHOUT an Exchange on either side (Spark SPJ against
  // the partition-reporting GraftBucketedScan + the catalog's bucket
  // function). At 100 TB this turns the fact-fact join from a full
  // two-sided shuffle into a local merge of co-located buckets.
  private def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val wh = tmp("spj_wh")
    val cat = s"graftbj${java.util.UUID.randomUUID().toString.take(8)}"
    graft.catalog.GraftCatalog.register(spark, wh, cat)
    // opt-in Spark feature; INTENTIONALLY left on for the session: the
    // returned frame plans its physical join lazily, so a try/finally
    // unset would strip the storage-partitioned join at execution time.
    // Only bucket-SPEC catalog tables change plan shape under it, and
    // this query's temp tables are the suite's only ones (correctness is
    // conf-independent either way).
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val c = customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
    val o = orders(spark, dir).select(col("o_custkey"), col("o_totalprice"))
    GraftTable.create(spark, s"$wh/db/cust", c.schema,
      spec = Seq(PartitionField("c_custkey", "bucket", 8))).append(c)
    GraftTable.create(spark, s"$wh/db/ords", o.schema,
      spec = Seq(PartitionField("o_custkey", "bucket", 8))).append(o)
    spark.sql(
      s"""SELECT c_mktsegment, count(*) AS n_orders,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total_price
         |FROM $cat.db.cust c JOIN $cat.db.ords o ON c.c_custkey = o.o_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  // Bloom dir skipping: point lookups on a NON-layout column consult the
  // per-commit bloom sidecars and read only matching data dirs — Iceberg's
  // per-file bloom metrics role, captured with zero extra passes (the
  // aggregate rides the write job's Observation).
  private def bloomPrunedScan(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val t = GraftTable.create(spark, tmp("bloom"), o.schema, bloomKeys = Seq("o_custkey"))
    // three commits with disjoint custkey ranges -> point lookups hit one
    t.append(o.filter(col("o_custkey") % 3 === 0))
    t.append(o.filter(col("o_custkey") % 3 === 1))
    t.append(o.filter(col("o_custkey") % 3 === 2))
    t.scan(col("o_custkey") === 1L)
      .orderBy("o_orderkey")
  }

  // Metadata-only aggregate serving: a bare COUNT(*)/MIN/MAX over a graft
  // catalog table folds to the snapshot's dir row counts + bounds
  // sidecars (the ResolveGraftTables count-fold rule) — at 100 TB
  // `SELECT count(*), min(ts), max(ts)` answers from O(dirs) driver
  // metadata reads without opening ONE data file, the role Iceberg's
  // manifest stats + Spark's aggregate pushdown play. The query proves
  // both directions of the rule's soundness condition: (1) on a clean
  // table the optimized plan is metadata-only (asserted: every leaf is a
  // LocalRelation — no scan survives), (2) once a rowDelta leaves PENDING
  // equality deletes the fold would over-count, so the rule must DECLINE
  // and the scan path returns the post-delete truth (asserted: a real
  // relation is back in the plan). Hash-verifying both rows proves the
  // folded numbers equal the scan's numbers exactly.
  private def statsAggFold(spark: SparkSession, dir: String): DataFrame = {
    val wh = tmp("saf_wh")
    val cat = s"graftsaf${java.util.UUID.randomUUID().toString.take(8)}"
    graft.catalog.GraftCatalog.register(spark, wh, cat)
    val o = orders(spark, dir).filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    val t = GraftTable.create(spark, s"$wh/db/ords", o.schema,
      key = Seq("o_orderkey"), statsKeys = Seq("o_orderkey", "o_orderdate"))
    // two appends: the fold must combine MULTIPLE dirs' counts/bounds
    t.append(o.filter(col("o_orderkey") % 2 === 0))
    t.append(o.filter(col("o_orderkey") % 2 =!= 0))
    val aggSql =
      s"""SELECT count(*) AS cnt, min(o_orderdate) AS mn, max(o_orderdate) AS mx
         |FROM $cat.db.ords""".stripMargin
    def isMetadataOnly(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectLeaves().forall(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    // the fold is an analyzer extension — plan-shape assertions only bind
    // in sessions built with GraftSparkSessionExtensions (the documented
    // production install; Verify/Bench use it). In a plain session both
    // phases scan and the VALUES are identical, so the oracle holds on
    // either path — the assertions are the extension-path proof.
    val ruleInstalled = spark.sessionState.analyzer.extendedResolutionRules
      .exists(_.isInstanceOf[graft.catalog.ResolveGraftTables])
    val clean = spark.sql(aggSql)
    assert(!ruleInstalled || isMetadataOnly(clean),
      "clean-table COUNT/MIN/MAX must fold to manifest stats (no scan in the plan)")
    // MoR: equality-delete + re-insert the same keys with a shifted date.
    // The pending delete files make dir row counts an over-count, so the
    // fold is unsound until the next compaction folds the deletes in.
    t.upgradeFormat(2)
    val hit = o.filter(col("o_orderkey") % 10 === 1)
    t.rowDelta(
      hit.select(col("o_orderkey")),
      hit.select(col("o_orderkey"),
        lit(java.time.LocalDateTime.parse("2005-06-01T00:00:00")).as("o_orderdate"),
        col("o_totalprice")),
      Seq("o_orderkey"))
    val mor = spark.sql(aggSql)
    assert(!ruleInstalled || !isMetadataOnly(mor),
      "pending equality deletes must disable the metadata fold (scan required)")
    clean.select(lit("p1_clean").as("phase"), col("cnt"), col("mn"), col("mx"))
      .unionAll(mor.select(lit("p2_mor_deletes").as("phase"), col("cnt"), col("mn"), col("mx")))
      .orderBy("phase")
  }

  // Bounds dir skipping: RANGE predicates on a NON-layout column check the
  // per-dir [min,max] sidecars (captured by the write job's Observation —
  // zero extra passes) and read only intersecting data dirs — the role
  // Iceberg's manifest column bounds play. Complements blooms (points).
  private def boundsPrunedScan(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
      col("o_totalprice"), col("o_orderdate"))
    val t = GraftTable.create(spark, tmp("bounds"), o.schema, statsKeys = Seq("o_orderdate"))
    // three commits with disjoint date ranges (SF-independent: TPC-H dates
    // span 1995..2001) -> a range scan's bounds hit one dir
    def ts(s: String) = lit(java.time.LocalDateTime.parse(s))
    t.append(o.filter(col("o_orderdate") < ts("1997-01-01T00:00:00")))
    t.append(o.filter(col("o_orderdate") >= ts("1997-01-01T00:00:00")
      && col("o_orderdate") < ts("1999-01-01T00:00:00")))
    t.append(o.filter(col("o_orderdate") >= ts("1999-01-01T00:00:00")))
    t.scan(col("o_orderdate") >= ts("2000-01-01T00:00:00") && col("o_totalprice") > 100000.0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  // Partition-spec evolution: a month-partitioned table evolves to an
  // identity spec on a different column mid-life. Metadata-only (old dirs
  // keep their layout); the post-evolution scan prunes each dir group by
  // the spec it was written under and stays exact.
  private def specEvolution(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
      col("o_totalprice"), col("o_orderdate"), col("o_orderstatus"))
    val t = GraftTable.create(spark, tmp("spec_ev"), o.schema,
      spec = Seq(PartitionField("o_orderdate", "month")))
    def ts(s: String) = lit(java.time.LocalDateTime.parse(s))
    t.append(o.filter(col("o_orderdate") < ts("1998-01-01T00:00:00")))
    t.updateSpec(Seq(PartitionField("o_orderstatus", "identity")))
    t.append(o.filter(col("o_orderdate") >= ts("1998-01-01T00:00:00")))
    t.scan(col("o_orderstatus") === "F" && col("o_orderdate") >= ts("1997-06-01T00:00:00"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(30, 2))).cast(DoubleType).as("total"))
      .orderBy("month")
  }

  // S4 — #history metadata suffix read through the DataSource registration
  // (IcebergHadoopTables.java:44: spark.read.format("iceberg").load(path + "#history"))
  private def historyMeta(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"))
    val t = GraftTable.create(spark, tmp("history"), cust.schema)
    t.append(cust)
    t.delete(col("customer_id") % 5 === 0)
    spark.read.format("graft").load(s"${t.dir}#history")
      .select(col("version"), col("parent_version"), col("operation"), col("is_current"))
      .orderBy("version")
  }

  // S4 — #partitions metadata table: per-partition file/row/byte layout
  // from k=v walk + parquet footers (the numbers Iceberg's manifests
  // cache) — row counts verifiable against a plain GROUP BY oracle
  private def partitionsMeta(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"),
      col("o_orderdate"))
    val t = GraftTable.create(spark, tmp("parts_meta"), o.schema,
      spec = Seq(PartitionField("o_orderdate", "month")))
    t.append(o)
    spark.read.format("graft").load(s"${t.dir}#partitions")
      .select(col("partition"), col("n_rows"))
      .orderBy("partition")
  }

  // K1/K2 — text-SQL INSERT through the GraftSql front (the reference's
  // most common write: `INSERT INTO ... select 1, 'customer_a', ...`,
  // IcebergSQLMerge.java:23-24, IcebergSCD2.java:26-31): literal-select
  // inserts, a VALUES insert, and a bulk INSERT ... SELECT from a view
  // of the real customer table, read back via SELECT passthrough.
  private def sqlInsert(spark: SparkSession, dir: String): DataFrame = {
    val g = graft.sql.GraftSql(spark)
    val cust = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"), col("c_acctbal").as("acctbal"))
    val t = GraftTable.create(spark, tmp("sql_ins"), cust.schema)
    val name = s"ins_cust_${java.util.UUID.randomUUID().toString.take(8)}"
    g.register(name, t)
    // ids far above any SF's custkey range — oracle constants stay SF-safe
    g.sql(s"INSERT INTO $name select 90000001, 'customer_a', 10.5")
    g.sql(s"INSERT INTO $name VALUES (90000002, 'customer_b', 20.5)")
    val src = s"ins_src_${java.util.UUID.randomUUID().toString.take(8)}"
    cust.filter(col("customer_id") % 3 === 0).createOrReplaceTempView(src)
    g.sql(s"INSERT INTO $name SELECT customer_id, name, acctbal FROM $src")
    g.sql(s"SELECT customer_id, name, acctbal FROM $name ORDER BY customer_id")
  }

  // S6 — #files metadata table (the MinIO object listing with sizes,
  // Minio.java:92-114, plus per-file footer row counts): an identity-
  // partitioned write lays one file per partition value (AQE rebalance on
  // the partition column), so per-partition file and row counts are
  // oracle-checkable against a plain GROUP BY. Sizes are asserted
  // in-query (real bytes, not zero) — compressed bytes can't have a
  // DuckDB oracle. NOTE the n_files=1 oracle constant holds while a
  // partition stays under AQE's 64MB advisory size (customer/5 segments
  // ≈ sf<30 — far past the harness's sf0.001..0.1 range); past that the
  // rebalance write legitimately splits partitions into multiple files.
  private def filesMeta(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir).select(col("c_custkey"), col("c_name"),
      col("c_mktsegment"))
    val t = GraftTable.create(spark, tmp("files_meta"), cust.schema,
      spec = Seq(PartitionField("c_mktsegment", "identity")))
    t.append(cust)
    // data PARQUET files only: the listing also surfaces write markers
    // (_SUCCESS, checksum sidecars) under data/, which carry no footer
    val f = spark.read.format("graft").load(s"${t.dir}#files")
      .filter(col("kind") === "data" && col("file").endsWith(".parquet"))
    val bad = f.filter(col("size") <= 0 || col("n_rows").isNull).count()
    assert(bad == 0, "every data file must list a real size and footer rows")
    f.groupBy(col("partition"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("n_rows"))
      .orderBy("partition")
  }

  // S4/D8 — snapshot-log metadata table
  private def snapshotsMeta(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"))
    val t = GraftTable.create(spark, tmp("snapshots"), cust.schema)
    t.append(cust)
    t.append(cust.filter(col("customer_id") % 2 === 0))
    t.delete(col("customer_id") % 7 === 0)
    t.addColumn("extra", StringType)
    t.snapshots.select(col("version"), col("operation"), col("format_version"))
      .orderBy("version")
  }

  // S4 — #manifests metadata table (IcebergHadoopTables.java:44-47):
  // one row per committed data/delete dir with its commit version and
  // logged row count. Paths are uuids, but (content, version, rows) is
  // fully determined by the op sequence, and the oracle derives the
  // counts from the same customer table — no SF-dependent constants.
  private def manifestsMeta(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"))
    val t = GraftTable.create(spark, tmp("manifests"), cust.schema,
      key = Seq("customer_id"), formatVersion = 2)
    t.append(cust)                                       // v1: all rows
    t.append(cust.filter(col("customer_id") % 2 === 0))  // v2: evens
    t.rowDelta(                                          // v3: deletes + 2 upserts
      cust.filter(col("customer_id") % 5 === 0).select(col("customer_id")),
      cust.limit(0).unionAll(spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          org.apache.spark.sql.Row(90000001L, "customer_a"),
          org.apache.spark.sql.Row(90000002L, "customer_b"))), cust.schema)),
      Seq("customer_id"))
    spark.read.format("graft").load(s"${t.dir}#manifests")
      .select(col("content"), col("committed_version"), col("row_count"))
      .orderBy("content", "committed_version")
  }

  // D8 — named-refs metadata table (`path#refs`): tags pin versions
  // immutably, branches move; the listing is oracle-checkable because
  // ref names/types/versions are fully determined by the op sequence.
  private def refsMetaQuery(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"))
    val t = GraftTable.create(spark, tmp("refs_meta"), cust.schema)
    t.append(cust)                                   // v1
    t.createTag("v1-audited", t.currentVersion)
    t.append(cust.filter(col("customer_id") % 2 === 0)) // v2
    t.createBranch("experiment", t.currentVersion)
    t.createTag("v2-release", t.currentVersion)
    spark.read.format("graft").load(s"${t.dir}#refs")
      .select(col("name"), col("type"), col("version"))
      .orderBy("name")
  }

  // Named refs + rollback + write-audit-publish: tag the audited state,
  // append junk, roll back to the tag (metadata-only, history preserved),
  // then stage a new batch, audit it in isolation, and publish it as a
  // metadata-only commit. Final table = audited state + published batch;
  // the junk never survives. All three mechanisms are O(1) pointer/log
  // operations — no data is copied at any scale.
  private def refsWapRollback(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir).select(col("c_custkey").as("customer_id"),
      col("c_name").as("name"))
    val good = cust.filter(col("customer_id") % 2 === 0)
    val t = GraftTable.create(spark, tmp("refs_wap"), good.schema)
    t.append(good)                                    // v1: the audited state
    t.createTag("audited", t.currentVersion)
    t.append(cust.withColumn("customer_id", col("customer_id") + 9000000)) // v2: junk
    t.rollbackTo("audited")                           // v3 = v1's state, new commit
    val staged = t.stageAppend(cust.filter(col("customer_id") % 2 =!= 0)
      .withColumn("name", concat(col("name"), lit("-wap"))))
    // audit gate: the staged rows are readable in isolation pre-publish
    require(t.stagedDF(staged).count() > 0, "staged batch is empty")
    t.publishStaged(staged)
    t.toDF.orderBy("customer_id")
  }


  /** Corpus RELEASE DELTA — "what changed between data release v1 and
    * v2", the governance diff every dataset card cites: build release 1
    * from two thirds of the corpus, evolve it to release 2 with one MoR
    * upsert (new docs + edited texts) and one delete, then DIFF the two
    * snapshot versions by content hash via time travel on the SAME
    * table. The oracle recomputes the delta declaratively from raw
    * parquet (the same mod-arithmetic edit spec), so the hash match is
    * the law that the table's time-travel diff equals the release's
    * declared edits — through the upsert's equality deletes, the CoW
    * delete's rewrite, and two asOf reads. Scale shape: the diff is one
    * doc_id-keyed full-outer join of two (doc_id, md5) projections —
    * the shuffle never carries text. */
  private def corpusDelta(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir).select(col("doc_id"), col("text"), col("lang"))
    val path = tmp("corpusdelta")
    val tbl = GraftTable.create(spark, path, docs.schema, key = Seq("doc_id"))
    tbl.upgradeFormat(2)
    tbl.append(docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)) // release 1
    val v1 = GraftTable.load(spark, path).snapshot.version
    // release 2: add the held-out third, edit every doc_id % 5 == 0
    val upserts = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .unionByName(docs
        .filter(pmod(col("doc_id"), lit(3)) =!= 0 && pmod(col("doc_id"), lit(5)) === 0)
        .withColumn("text", concat(col("text"), lit(" [rev2]"))))
    tbl.rowDelta(upserts.select(col("doc_id")), upserts, Seq("doc_id"))
    tbl.delete(pmod(col("doc_id"), lit(7)) === 3) // retracted docs
    val re = GraftTable.load(spark, path)
    val a = re.asOf(v1).select(col("doc_id"), md5(col("text")).as("h1"))
    val b = re.toDF.select(col("doc_id"), md5(col("text")).as("h2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") =!= col("h2"), "modified")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("status"))
      .orderBy("doc_id")
  }

  private val corpusDeltaOracle: String =
    // the DECLARATIVE edit spec, straight from raw parquet — no table
    // layer: v1 = ids % 3 != 0 with original text; v2 = everything except
    // ids % 7 == 3, texts of ids % 5 == 0 edited
    """WITH d AS (SELECT doc_id, lang FROM documents),
      |st AS (SELECT doc_id, lang,
      |  CASE WHEN doc_id % 3 <> 0 AND doc_id % 7 = 3 THEN 'removed'
      |       WHEN doc_id % 3 = 0 AND doc_id % 7 <> 3 THEN 'added'
      |       WHEN doc_id % 3 <> 0 AND doc_id % 7 <> 3 AND doc_id % 5 = 0 THEN 'modified'
      |  END AS status FROM d)
      |SELECT doc_id, lang, status FROM st WHERE status IS NOT NULL
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_json_infer" -> scanJsonInfer,
    "scan_filter_project" -> scanFilterProject,
    "union_literals_to_date" -> unionLiteralsToDate,
    "order_by_limit" -> orderByLimit,
    "inner_join_residual" -> innerJoinResidual,
    "merge_explicit" -> mergeExplicit,
    "merge_guard" -> mergeGuard,
    "merge_star_evolve" -> mergeStarEvolve,
    "delete_where" -> deleteWhere,
    "positional_delete" -> positionalDelete,
    "scd2_pipeline" -> (scd2Pipeline _),
    "rowdelta_upsert" -> rowdeltaUpsert,
    "schema_add_drop" -> schemaAddDrop,
    "partition_transform" -> partitionTransform,
    "partition_count_fold" -> partitionCountFold,
    "stats_backfill" -> statsBackfill,
    "iceberg_bucket_vectors" -> (icebergBucketVectors _),
    "partition_pruned_scan" -> partitionPrunedScan,
    "writeto_append" -> writetoAppend,
    "sql_mor_dml" -> sqlMorDml,
    "sql_cow_dml" -> sqlCowDml,
    "sql_merge_evolve" -> sqlMergeEvolve,
    "format_save_roundtrip" -> formatSaveRoundtrip,
    "bucketed_join" -> bucketedJoin,
    "snapshots_meta" -> snapshotsMeta,
    "history_meta" -> historyMeta,
    "partitions_meta" -> partitionsMeta,
    "files_meta" -> filesMeta,
    "manifests_meta" -> manifestsMeta,
    "refs_meta" -> refsMetaQuery,
    "sql_insert" -> sqlInsert,
    "bloom_pruned_scan" -> bloomPrunedScan,
    "bounds_pruned_scan" -> boundsPrunedScan,
    "stats_agg_fold" -> statsAggFold,
    "spec_evolution" -> specEvolution,
    "time_travel" -> timeTravel,
    "changelog_read" -> changelogRead,
    "corpus_delta" -> corpusDelta,
    "incremental_rollup" -> incrementalRollup,
    "incremental_read" -> incrementalRead,
    "merge_full_sync" -> mergeFullSync,
    "refs_wap_rollback" -> refsWapRollback,
    "maintenance_compact" -> maintenanceCompact,
    "zorder_rewrite" -> zorderRewrite,
    "rewrite_small_dirs" -> rewriteSmallDirsQuery,
    "vacuum_orphans" -> vacuumOrphansQuery
  )

  val oracles: Map[String, String] = Map(
    "scan_json_infer" ->
      """SELECT CAST(age AS BIGINT) AS age, name
        |FROM (VALUES (1122,'User-1'),(1130,'User-2'),(1119,'User-3')) t(age,name)
        |ORDER BY age""".stripMargin,
    "scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1995-06-01' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "union_literals_to_date" ->
      """SELECT CAST(1 AS BIGINT) AS customer_id, 'customer_a-V1' AS name, CAST(DATE '2020-01-01' AS VARCHAR) AS effective_date
        |UNION ALL SELECT CAST(1 AS BIGINT), 'customer_a-V2', CAST(DATE '2020-01-12' AS VARCHAR)
        |UNION ALL SELECT CAST(2 AS BIGINT), 'customer_b-V1', CAST(DATE '9999-12-31' AS VARCHAR)
        |ORDER BY customer_id, effective_date""".stripMargin,
    "order_by_limit" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 100""".stripMargin,
    "inner_join_residual" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'F'
        |ORDER BY o_orderkey""".stripMargin,
    "merge_explicit" ->
      """WITH t AS (SELECT c_custkey AS customer_id, c_name AS name, c_acctbal AS acctbal FROM customer),
        |s AS (SELECT c_custkey AS customer_id, c_name || '-updated' AS name, c_acctbal + 100.0 AS acctbal
        |      FROM customer WHERE c_custkey % 3 = 0
        |      UNION ALL
        |      SELECT c_custkey + 1000000, c_name || '-new', c_acctbal
        |      FROM customer WHERE c_custkey % 7 = 0)
        |SELECT COALESCE(t.customer_id, s.customer_id) AS customer_id,
        |       CASE WHEN s.customer_id IS NOT NULL THEN s.name ELSE t.name END AS name,
        |       CASE WHEN s.customer_id IS NOT NULL THEN s.acctbal ELSE t.acctbal END AS acctbal
        |FROM t FULL OUTER JOIN s ON t.customer_id = s.customer_id
        |ORDER BY customer_id""".stripMargin,
    "merge_guard" ->
      """WITH t AS (SELECT c_custkey AS customer_id, c_name AS name, CAST(c_custkey % 5 AS INT) AS rts FROM customer),
        |s AS (SELECT c_custkey AS customer_id, c_name || '-u' AS name, CAST(3 AS INT) AS rts
        |      FROM customer WHERE c_custkey % 2 = 0)
        |SELECT t.customer_id AS customer_id,
        |       CASE WHEN s.customer_id IS NOT NULL AND t.rts < s.rts THEN s.name ELSE t.name END AS name,
        |       CASE WHEN s.customer_id IS NOT NULL AND t.rts < s.rts THEN s.rts ELSE t.rts END AS rts
        |FROM t LEFT JOIN s ON t.customer_id = s.customer_id
        |ORDER BY customer_id""".stripMargin,
    "merge_star_evolve" ->
      """SELECT c_custkey AS customer_id,
        |       CASE WHEN c_custkey % 4 = 0 THEN c_name || '-s' ELSE c_name END AS name,
        |       CASE WHEN c_custkey % 4 = 0 THEN c_mktsegment ELSE CAST(NULL AS VARCHAR) END AS segment
        |FROM customer ORDER BY customer_id""".stripMargin,
    "delete_where" ->
      """SELECT c_custkey AS customer_id, c_name AS name, c_acctbal AS acctbal, c_mktsegment AS mktsegment
        |FROM customer
        |WHERE NOT (c_custkey % 10 < 3 AND c_mktsegment = 'BUILDING')
        |ORDER BY customer_id""".stripMargin,
    "positional_delete" ->
      """SELECT c_custkey AS customer_id, c_name AS name, c_acctbal AS acctbal
        |FROM customer WHERE c_custkey % 7 <> 0
        |ORDER BY customer_id""".stripMargin,
    "scd2_pipeline" ->
      """WITH cust AS (SELECT c_custkey AS customer_id, c_name AS name FROM customer),
        |dim AS (
        |  SELECT customer_id, name, true AS is_current, DATE '2020-01-01' AS effective_date, DATE '9999-12-31' AS end_date FROM cust
        |  UNION ALL
        |  SELECT customer_id, name || '-V0', false, DATE '2019-06-01', DATE '2020-01-01' FROM cust WHERE customer_id % 4 = 0),
        |stg AS (SELECT customer_id FROM cust WHERE customer_id % 3 = 0)
        |SELECT d.customer_id AS customer_id, d.name AS name,
        |       CASE WHEN d.is_current AND d.customer_id IN (SELECT customer_id FROM stg) THEN false ELSE d.is_current END AS is_current,
        |       CAST(d.effective_date AS VARCHAR) AS effective_date,
        |       CAST(CASE WHEN d.is_current AND d.customer_id IN (SELECT customer_id FROM stg) THEN DATE '2020-02-15' ELSE d.end_date END AS VARCHAR) AS end_date
        |FROM dim d
        |UNION ALL
        |SELECT customer_id, name || '-V2', true, CAST(DATE '2020-02-15' AS VARCHAR), CAST(DATE '9999-12-31' AS VARCHAR) FROM cust WHERE customer_id % 3 = 0
        |ORDER BY customer_id, effective_date""".stripMargin,
    "rowdelta_upsert" ->
      """SELECT c_custkey AS customer_id, c_name AS name, c_acctbal AS acctbal
        |FROM customer WHERE c_custkey % 5 <> 0
        |UNION ALL
        |SELECT c_custkey, c_name || '-v2', c_acctbal + 50.0
        |FROM customer WHERE c_custkey % 5 = 0
        |ORDER BY customer_id""".stripMargin,
    "schema_add_drop" ->
      """SELECT c_custkey AS customer_id, c_name AS name, CAST(NULL AS VARCHAR) AS segment FROM customer
        |UNION ALL
        |SELECT c_custkey + 2000000, c_name, c_mktsegment FROM customer WHERE c_custkey % 2 = 0
        |ORDER BY customer_id""".stripMargin,
    "partition_transform" ->
      """SELECT 'o_orderdate_month=' || strftime(o_orderdate, '%Y-%m') AS part, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY part""".stripMargin,
    "partition_count_fold" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY o_orderpriority
        |UNION ALL
        |SELECT 'F-filtered' AS o_orderpriority, count(*) AS n FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT 'stats-fold' AS o_orderpriority, c + lo + hi + s AS n FROM
        |  (SELECT count(nullif(o_orderstatus, 'F')) AS c, min(o_orderkey) AS lo,
        |          max(o_orderkey) AS hi, CAST(sum(o_orderkey) AS BIGINT) AS s FROM orders)
        |UNION ALL
        |SELECT 'scoped-' || o_orderpriority AS o_orderpriority, lo + hi + m + s AS n FROM
        |  (SELECT o_orderpriority, min(o_orderkey) AS lo, max(o_orderkey) AS hi,
        |          count(*) AS m, CAST(sum(o_orderkey) AS BIGINT) AS s FROM orders
        |   WHERE o_orderstatus = 'F' GROUP BY o_orderpriority)
        |ORDER BY o_orderpriority""".stripMargin,
    "stats_backfill" ->
      """SELECT c_mktsegment, count(*) AS n, min(c_custkey) AS lo, max(c_custkey) AS hi
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "iceberg_bucket_vectors" -> icebergBucketVectorsOracle,
    "partition_pruned_scan" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-03-01' AND o_orderdate < TIMESTAMP '1997-06-01'
        |GROUP BY 1 ORDER BY month""".stripMargin,
    "writeto_append" ->
      """WITH base AS (SELECT c_custkey AS customer_id, c_name AS name, c_acctbal AS acctbal FROM customer)
        |SELECT customer_id, name, acctbal FROM base
        |UNION ALL
        |SELECT customer_id + 3000000, name || '-ins', acctbal FROM base WHERE customer_id % 100 = 0
        |ORDER BY customer_id""".stripMargin,
    "sql_mor_dml" ->
      """SELECT customer_id, name,
        |       CASE WHEN customer_id % 7 = 0 THEN orig * 2
        |            WHEN customer_id % 5 = 0 THEN orig + 50.0
        |            ELSE orig END AS acctbal
        |FROM (SELECT c_custkey AS customer_id, c_name AS name, c_acctbal AS orig FROM customer)
        |UNION ALL
        |SELECT c_custkey + 2000000, c_name || '-m', c_acctbal FROM customer WHERE c_custkey % 50 = 0
        |ORDER BY customer_id""".stripMargin,
    "sql_merge_evolve" ->
      """SELECT customer_id, name, acctbal FROM (
        |  SELECT c_custkey AS customer_id,
        |         CASE WHEN c_custkey % 3 = 0 THEN c_name || '-u' ELSE c_name END AS name,
        |         CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE NULL END AS acctbal
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 4000000, c_name || '-i', c_acctbal FROM customer WHERE c_custkey % 100 = 0
        |) ORDER BY customer_id""".stripMargin,
    "corpus_delta" -> corpusDeltaOracle,
    "changelog_read" ->
      """SELECT customer_id, name, _change_type, _commit_version FROM (
        |  SELECT c_custkey AS customer_id, c_name AS name,
        |         'insert' AS _change_type, CAST(1 AS INT) AS _commit_version FROM customer
        |  UNION ALL
        |  SELECT c_custkey, c_name, 'delete', CAST(2 AS INT) FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_name || '-v2', 'insert', CAST(2 AS INT) FROM customer WHERE c_custkey % 10 = 0
        |) ORDER BY _commit_version, _change_type, customer_id""".stripMargin,
    "incremental_rollup" ->
      """WITH base AS (SELECT c_custkey AS id, c_mktsegment AS seg,
        |                     CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer),
        |final AS (
        |  SELECT id, seg,
        |         CASE WHEN id % 10 = 2 THEN CAST(bal + 100 AS DECIMAL(18,2)) ELSE bal END AS bal
        |  FROM base WHERE id % 2 = 0 OR (id % 2 = 1 AND id % 5 <> 0))
        |SELECT seg, count(*) AS n_rows, CAST(sum(bal) AS DOUBLE) AS total
        |FROM final GROUP BY seg ORDER BY seg""".stripMargin,
    "sql_cow_dml" ->
      """SELECT customer_id, name,
        |       CASE WHEN customer_id % 20 = 0 THEN orig * 3
        |            WHEN customer_id % 4 = 3 THEN orig + 50.0
        |            ELSE orig END AS acctbal
        |FROM (SELECT c_custkey AS customer_id, c_name AS name, c_acctbal AS orig FROM customer)
        |UNION ALL
        |SELECT c_custkey + 3000000, c_name || '-m', c_acctbal FROM customer WHERE c_custkey % 50 = 0
        |ORDER BY customer_id""".stripMargin,
    "format_save_roundtrip" ->
      """WITH base AS (SELECT c_custkey AS customer_id, c_name AS name, c_acctbal AS acctbal FROM customer)
        |SELECT customer_id, name, acctbal FROM (
        |  SELECT * FROM base
        |  UNION ALL
        |  SELECT customer_id, name || '-dup', acctbal FROM base WHERE customer_id % 100 = 0
        |) ORDER BY customer_id, name""".stripMargin,
    "bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total_price
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "bloom_pruned_scan" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey = 1 ORDER BY o_orderkey""".stripMargin,
    "bounds_pruned_scan" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2000-01-01' AND o_totalprice > 100000.0
        |ORDER BY o_orderkey""".stripMargin,
    "stats_agg_fold" ->
      """WITH base AS (SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderkey % 3 = 0),
        |upd AS (SELECT o_orderkey,
        |          CASE WHEN o_orderkey % 10 = 1 THEN TIMESTAMP '2005-06-01' ELSE o_orderdate END AS o_orderdate
        |        FROM base)
        |SELECT 'p1_clean' AS phase, count(*) AS cnt,
        |       min(o_orderdate) AS mn, max(o_orderdate) AS mx FROM base
        |UNION ALL
        |SELECT 'p2_mor_deletes', count(*), min(o_orderdate), max(o_orderdate) FROM upd
        |ORDER BY phase""".stripMargin,
    "spec_evolution" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_orderstatus = 'F' AND o_orderdate >= TIMESTAMP '1997-06-01'
        |GROUP BY 1 ORDER BY month""".stripMargin,
    "history_meta" ->
      """SELECT CAST(v AS INT) AS version, CAST(p AS INT) AS parent_version, op AS operation, cur AS is_current
        |FROM (VALUES (0,-1,'create',false),(1,0,'append',false),(2,1,'overwrite',true)) t(v,p,op,cur)
        |ORDER BY version""".stripMargin,
    "partitions_meta" ->
      """SELECT 'o_orderdate_month=' || strftime(o_orderdate, '%Y-%m') AS partition,
        |  count(*) AS n_rows
        |FROM orders GROUP BY 1 ORDER BY partition""".stripMargin,
    "files_meta" ->
      """SELECT 'c_mktsegment=' || c_mktsegment AS partition,
        |  CAST(1 AS BIGINT) AS n_files, count(*) AS n_rows
        |FROM customer GROUP BY c_mktsegment ORDER BY partition""".stripMargin,
    "sql_insert" ->
      """SELECT customer_id, name, acctbal FROM (
        |  SELECT c_custkey AS customer_id, c_name AS name, c_acctbal AS acctbal
        |  FROM customer WHERE c_custkey % 3 = 0
        |  UNION ALL SELECT 90000001, 'customer_a', 10.5
        |  UNION ALL SELECT 90000002, 'customer_b', 20.5
        |) ORDER BY customer_id""".stripMargin,
    "snapshots_meta" ->
      """SELECT CAST(v AS INT) AS version, op AS operation, CAST(f AS INT) AS format_version
        |FROM (VALUES (0,'create',1),(1,'append',1),(2,'append',1),(3,'overwrite',1),(4,'add-column',1)) t(v,op,f)
        |ORDER BY version""".stripMargin,
    "refs_meta" ->
      """SELECT n AS name, t AS type, CAST(v AS INT) AS version
        |FROM (VALUES ('experiment','branch',2),('v1-audited','tag',1),('v2-release','tag',2)) r(n,t,v)
        |ORDER BY name""".stripMargin,
    "manifests_meta" ->
      """SELECT content, CAST(v AS INT) AS committed_version, CAST(n AS BIGINT) AS row_count
        |FROM (
        |  SELECT 'data' AS content, 1 AS v, (SELECT count(*) FROM customer) AS n
        |  UNION ALL SELECT 'data', 2, (SELECT count(*) FROM customer WHERE c_custkey % 2 = 0)
        |  UNION ALL SELECT 'data', 3, 2
        |  UNION ALL SELECT 'deletes', 3, (SELECT count(*) FROM customer WHERE c_custkey % 5 = 0)
        |) ORDER BY content, committed_version""".stripMargin,
    "time_travel" ->
      """SELECT CAST(1 AS BIGINT) AS version, (SELECT count(*) FROM customer) AS n_rows
        |UNION ALL
        |SELECT 2, (SELECT count(*) FROM customer) + (SELECT count(*) FROM customer WHERE c_custkey % 2 = 0)
        |UNION ALL
        |SELECT 3, (SELECT count(*) FROM customer WHERE c_custkey % 3 <> 0)
        |         + (SELECT count(*) FROM customer WHERE c_custkey % 2 = 0 AND c_custkey % 3 <> 0)
        |ORDER BY version""".stripMargin,
    "incremental_read" ->
      """SELECT c_custkey AS customer_id, c_name || '-b2' AS name
        |FROM customer WHERE c_custkey % 2 = 0 ORDER BY customer_id""".stripMargin,
    "merge_full_sync" ->
      """SELECT c_custkey AS customer_id, c_name || '-sync' AS name
        |FROM customer WHERE c_custkey % 2 = 0 ORDER BY customer_id""".stripMargin,
    "refs_wap_rollback" ->
      """SELECT customer_id, name FROM (
        |  SELECT c_custkey AS customer_id, c_name AS name FROM customer WHERE c_custkey % 2 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_name || '-wap' FROM customer WHERE c_custkey % 2 <> 0
        |) ORDER BY customer_id""".stripMargin,
    "maintenance_compact" ->
      """WITH b AS (SELECT c_custkey AS customer_id,
        |    CASE WHEN c_custkey % 5 = 0 THEN c_name || '-v2' ELSE c_name END AS name,
        |    CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 50.0 ELSE c_acctbal END AS acctbal
        |  FROM customer)
        |SELECT customer_id, name, acctbal FROM b
        |WHERE NOT (acctbal < 0.0) ORDER BY customer_id""".stripMargin,
    "zorder_rewrite" -> zorderOracle,
    // bin-packing is result-invariant by law: the oracle is the raw table
    "rewrite_small_dirs" ->
      """SELECT c_custkey AS customer_id, c_name AS name, c_acctbal AS acctbal
        |FROM customer ORDER BY customer_id""".stripMargin,
    "vacuum_orphans" ->
      """SELECT c_custkey AS customer_id, c_name AS name, c_acctbal AS acctbal
        |FROM customer ORDER BY customer_id""".stripMargin
  )
}
