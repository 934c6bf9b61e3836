package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.table.{GraftTable, PartitionField}

/** Partition-count folds: GROUP BY on identity-partition columns and
  * partition-equality filtered COUNT(*) fold at analysis from the
  * per-leaf pstats sidecars (GraftPartitionFold) — no scan, no job over
  * row data, the role Iceberg's per-manifest partition summaries play.
  * Every shape the sidecars can't answer soundly (non-identity
  * transforms, pending MoR deletes, range predicates, pre-partitioning
  * dirs) must scan — and still answer correctly. */
class PartitionCountFoldSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    val wh = java.nio.file.Files.createTempDirectory("graft_pcf_wh").toString
    GraftCatalog.register(spark, wh)
    wh
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("g", StringType),
    StructField("d", DateType)))

  private def rows(t: (Long, String, String)*) =
    t.toSeq.map { case (i, g, d) =>
      (i, g, Option(d).map(java.sql.Date.valueOf).orNull)
    }.toDF("id", "g", "d")

  /** True when the query is answered without any table/file scan. */
  private def folded(sql: String): Boolean =
    spark.sql(sql).queryExecution.analyzed.collectLeaves()
      .forall(_.isInstanceOf[LocalRelation])

  test("GROUP BY an identity partition column folds across commits") {
    val t = GraftTable.create(spark, s"$warehouse/db/p1", schema,
      spec = Seq(PartitionField("g", "identity")))
    t.append(rows((1L, "a", "2024-01-01"), (2L, "b", "2024-01-02")))
    t.append(rows((3L, "a", "2024-01-03"), (4L, "a", "2024-01-04")))
    val q = "SELECT g, count(*) AS n FROM graft.db.p1 GROUP BY g"
    assert(folded(q), spark.sql(q).queryExecution.analyzed.toString)
    val got = spark.sql(q).as[(String, Long)].collect().toMap
    val want = t.toDF.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(got == want && got == Map("a" -> 3L, "b" -> 1L))
    // DISTINCT projection of the partition column folds too
    assert(folded("SELECT g FROM graft.db.p1 GROUP BY g"))
    assert(spark.sql("SELECT DISTINCT g FROM graft.db.p1")
      .as[String].collect().toSet == Set("a", "b"))
  }

  test("partition-equality filtered counts fold: =, IN, and grouped") {
    val t = GraftTable.create(spark, s"$warehouse/db/p2", schema,
      spec = Seq(PartitionField("g", "identity"), PartitionField("d", "identity")))
    t.append(rows((1L, "a", "2024-01-01"), (2L, "b", "2024-01-01"),
      (3L, "a", "2024-01-02")))
    t.append(rows((4L, "a", "2024-01-01")))
    assert(folded("SELECT count(*) AS n FROM graft.db.p2 WHERE g = 'a'"))
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.p2 WHERE g = 'a'")
      .as[Long].head() == 3L)
    assert(folded("SELECT count(*) FROM graft.db.p2 WHERE g IN ('a', 'b')"))
    assert(spark.sql("SELECT count(*) FROM graft.db.p2 WHERE g IN ('a', 'b')")
      .as[Long].head() == 4L)
    // date-typed partition value round-trips the path encoding
    val dq = "SELECT count(*) FROM graft.db.p2 WHERE d = DATE'2024-01-01'"
    assert(folded(dq))
    assert(spark.sql(dq).as[Long].head() == 3L)
    // grouped under a filter on the OTHER partition column
    val gq = "SELECT g, count(*) AS n FROM graft.db.p2 " +
      "WHERE d = DATE'2024-01-01' GROUP BY g"
    assert(folded(gq))
    assert(spark.sql(gq).as[(String, Long)].collect().toMap ==
      Map("a" -> 2L, "b" -> 1L))
    // a filter value matching no leaf still answers (zero / empty)
    assert(folded("SELECT count(*) FROM graft.db.p2 WHERE g = 'zz'"))
    assert(spark.sql("SELECT count(*) FROM graft.db.p2 WHERE g = 'zz'")
      .as[Long].head() == 0L)
    assert(spark.sql("SELECT g, count(*) FROM graft.db.p2 WHERE g = 'zz' GROUP BY g")
      .count() == 0L)
  }

  test("null partition values group as NULL and never match equality") {
    val t = GraftTable.create(spark, s"$warehouse/db/p3", schema,
      spec = Seq(PartitionField("g", "identity")))
    t.append(rows((1L, "a", "2024-01-01"), (2L, null, "2024-01-02"),
      (3L, null, "2024-01-03")))
    val q = "SELECT g, count(*) AS n FROM graft.db.p3 GROUP BY g"
    assert(folded(q))
    val got = spark.sql(q).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("a" -> 1L, (null: String) -> 2L))
    assert(folded("SELECT count(*) FROM graft.db.p3 WHERE g = 'a'"))
    assert(spark.sql("SELECT count(*) FROM graft.db.p3 WHERE g = 'a'")
      .as[Long].head() == 1L) // the null leaves are excluded, like the scan
  }

  test("unsound shapes scan normally and stay correct") {
    val t = GraftTable.create(spark, s"$warehouse/db/p4", schema,
      spec = Seq(PartitionField("g", "identity")), key = Seq("id"),
      formatVersion = 2)
    t.append(rows((1L, "a", "2024-01-01"), (2L, "b", "2024-01-02")))
    // range predicate on the partition column: not a point fold
    assert(!folded("SELECT count(*) FROM graft.db.p4 WHERE g > 'a'"))
    assert(spark.sql("SELECT count(*) FROM graft.db.p4 WHERE g > 'a'")
      .as[Long].head() == 1L)
    // group-by on a NON-partition column
    assert(!folded("SELECT id, count(*) FROM graft.db.p4 GROUP BY id"))
    // an extra aggregate the sidecars can't serve
    assert(!folded("SELECT g, count(*), max(id) FROM graft.db.p4 GROUP BY g"))
    // pending MoR deletes: leaf counts include overwritten rows — scan
    t.rowDelta(Seq(2L).toDF("id"), rows((2L, "b", "2024-02-02")), Seq("id"))
    assert(!folded("SELECT g, count(*) FROM graft.db.p4 GROUP BY g"))
    assert(spark.sql("SELECT g, count(*) AS n FROM graft.db.p4 GROUP BY g")
      .as[(String, Long)].collect().toMap == Map("a" -> 1L, "b" -> 1L))
    // a non-identity transform never folds (the leaf is not the value)
    val m = GraftTable.create(spark, s"$warehouse/db/p5", schema,
      spec = Seq(PartitionField("d", "month")))
    m.append(rows((1L, "a", "2024-01-01"), (2L, "b", "2024-01-15")))
    assert(!folded("SELECT d, count(*) FROM graft.db.p5 GROUP BY d"))
    assert(!folded("SELECT count(*) FROM graft.db.p5 WHERE d = DATE'2024-01-01'"))
  }

  test("a pre-partitioning dir (spec evolution) disables the fold") {
    val t = GraftTable.create(spark, s"$warehouse/db/p6", schema)
    t.append(rows((1L, "a", "2024-01-01")))          // unpartitioned dir
    t.updateSpec(Seq(PartitionField("g", "identity")))
    t.append(rows((2L, "b", "2024-01-02")))          // k=v dir
    assert(!folded("SELECT g, count(*) FROM graft.db.p6 GROUP BY g"))
    assert(spark.sql("SELECT g, count(*) AS n FROM graft.db.p6 GROUP BY g")
      .as[(String, Long)].collect().toMap == Map("a" -> 1L, "b" -> 1L))
  }

  test("partition-scoped min/max/count(col) fold from the pcolstats sidecars") {
    val t = GraftTable.create(spark, s"$warehouse/db/p8", schema,
      spec = Seq(PartitionField("g", "identity")),
      statsKeys = Seq("id", "d"))
    t.append(rows((5L, "a", "2024-01-01"), (2L, "a", null),
      (9L, "b", "2024-02-01")))
    t.append(rows((7L, "a", "2024-03-01"), (1L, "b", null),
      (3L, "c", null)))
    val q = "SELECT g, count(*) AS n, count(d) AS nd, min(id) AS lo, " +
      "max(id) AS hi, sum(id) AS si FROM graft.db.p8 GROUP BY g"
    assert(folded(q), spark.sql(q).queryExecution.analyzed.toString)
    val got = spark.sql(q).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSet
    assert(got == Set(("a", 3L, 2L, 2L, 7L, 14L), ("b", 2L, 1L, 1L, 9L, 10L),
      ("c", 1L, 0L, 3L, 3L, 3L)))
    // the date column folds too, and an all-NULL group's bound is NULL
    val dq = "SELECT g, max(d) AS hi FROM graft.db.p8 GROUP BY g"
    assert(folded(dq))
    val dGot = spark.sql(dq).collect()
      .map(r => (r.getString(0), Option(r.getDate(1)).map(_.toString))).toSet
    assert(dGot == Set(("a", Some("2024-03-01")), ("b", Some("2024-02-01")),
      ("c", None)))
    // filtered global stats: min/max/count under a partition-equality
    val fq = "SELECT min(id) AS lo, max(d) AS hi, count(d) AS nd " +
      "FROM graft.db.p8 WHERE g = 'a'"
    assert(folded(fq))
    val fr = spark.sql(fq).head()
    assert(fr.getLong(0) == 2L && fr.getDate(1).toString == "2024-03-01" &&
      fr.getLong(2) == 2L)
    // min/max on a NON-stats column declines (g itself is not a statsKey)
    assert(!folded("SELECT g, min(g) FROM graft.db.p8 GROUP BY g"))
    // a table whose stats predate pcolstats (none written) declines:
    // p1 has no statsKeys at all
    assert(!folded("SELECT g, min(id) FROM graft.db.p1 GROUP BY g"))
    // results survive compaction (sidecars re-captured for the new dir)
    t.compact()
    val got2 = spark.sql(q).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSet
    assert(got2 == got)
  }

  test("VERSION AS OF folds against the pinned snapshot's leaves") {
    val t = GraftTable.create(spark, s"$warehouse/db/p7", schema,
      spec = Seq(PartitionField("g", "identity")))
    t.append(rows((1L, "a", "2024-01-01")))                     // v1
    t.append(rows((2L, "a", "2024-01-02"), (3L, "b", "2024-01-03"))) // v2
    val q1 = "SELECT g, count(*) AS n FROM graft.db.p7 VERSION AS OF 1 GROUP BY g"
    assert(folded(q1))
    assert(spark.sql(q1).as[(String, Long)].collect().toMap == Map("a" -> 1L))
    assert(spark.sql("SELECT g, count(*) AS n FROM graft.db.p7 GROUP BY g")
      .as[(String, Long)].collect().toMap == Map("a" -> 2L, "b" -> 1L))
  }
}
