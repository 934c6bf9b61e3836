package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.GraftSql
import graft.table.GraftTable

/** Drives the text-SQL front with the reference's own SQL statements
  * (IcebergSQLMerge.java, IcebergSQLDelete.java,
  * IcebergSQLMergeAsDeleteInsert.java) — the post-states asserted here
  * are the ones the reference demos print. */
class GraftSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def freshTable(name: String): (GraftSql, GraftTable) = {
    val g = GraftSql(spark)
    val t = GraftTable.create(spark, TestSpark.tmpDir(s"sql_$name"), StructType(Seq(
      StructField("customer_id", LongType), StructField("name", StringType),
      StructField("lastname", StringType))))
    g.register("test_table", t)
    (g, t)
  }

  test("reference MERGE SQL: explicit clauses (IcebergSQLMerge.java:29-46)") {
    val (g, t) = freshTable("m2")
    g.sql("INSERT INTO test_table select 1, 'customer_a', 'lastname-1'")
    g.sql("INSERT INTO test_table select 2, 'customer_b', 'lastname-2'")
    g.sql(
      """MERGE INTO test_table t
        |USING (
        |    SELECT 3 as customer_id, 'customer_c-insert(with merge sql)' as name, 'lastname-3-insert(with merge sql)' as lastname
        |    UNION ALL
        |    SELECT 2 as customer_id, 'customer_b-updated(with merge sql)' as name, 'lastname-2-updated(with merge sql)' as lastname
        |) s
        |ON s.customer_id = t.customer_id
        |WHEN MATCHED
        |  THEN UPDATE SET t.name = s.name, t.lastname = s.lastname
        |WHEN NOT MATCHED THEN
        |   INSERT(customer_id, name, lastname)
        |   VALUES(s.customer_id, s.name, s.lastname)""".stripMargin)
    val got = t.toDF.orderBy("customer_id").as[(Long, String, String)].collect().toSeq
    assert(got == Seq(
      (1L, "customer_a", "lastname-1"),
      (2L, "customer_b-updated(with merge sql)", "lastname-2-updated(with merge sql)"),
      (3L, "customer_c-insert(with merge sql)", "lastname-3-insert(with merge sql)")))
  }

  test("reference MERGE SQL: star clauses + schema evolution (IcebergSQLMerge.java:50-72)") {
    val (g, t) = freshTable("m3")
    g.sql("INSERT INTO test_table select 1, 'customer_a', 'lastname-1'")
    val starMerge =
      """MERGE INTO test_table t
        |USING (
        |    SELECT 4 as customer_id, 'customer_c' as name, 'lastname-4' as lastname, 'a@b.com' as email
        |) s
        |ON s.customer_id = t.customer_id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    // pre-evolution: extra source column ignored
    g.sql(starMerge)
    assert(t.toDF.columns.toSeq == Seq("customer_id", "name", "lastname"))
    assert(t.toDF.count() == 2)
    // evolve, re-run: email now lands
    t.addColumn("email", StringType)
    g.sql(starMerge)
    val row4 = t.toDF.filter($"customer_id" === 4L).collect().head
    assert(row4.getString(3) == "a@b.com")
  }

  test("reference MERGE SQL: matched guard (IcebergSQLMergeAsDeleteInsert.java:30-50)") {
    val g = GraftSql(spark)
    val t = GraftTable.create(spark, TestSpark.tmpDir("sql_guard"), StructType(Seq(
      StructField("customer_id", LongType), StructField("name", StringType),
      StructField("record_change_timestamp", IntegerType))))
    g.register("test_table", t)
    g.sql("INSERT INTO test_table select 1, 'customer_a', 1")
    g.sql("INSERT INTO test_table select 2, 'customer_b', 1")
    g.sql("INSERT INTO test_table select 3, 'customer_b', 2")
    g.sql(
      """MERGE INTO test_table t
        |USING (
        |    SELECT 1 as customer_id, 'customer_c-insert(with merge sql)' as name, 1 as record_change_timestamp
        |    UNION ALL
        |    SELECT 2 as customer_id, 'customer_b-updated(with merge sql)' as name, 2 as record_change_timestamp
        |    UNION ALL
        |    SELECT 3 as customer_id, 'customer_b-updated(with merge sql)' as name, 2 as record_change_timestamp
        |) s
        |ON s.customer_id = t.customer_id
        |WHEN MATCHED and t.record_change_timestamp < s.record_change_timestamp
        |  THEN UPDATE SET t.name = s.name, t.record_change_timestamp = s.record_change_timestamp
        |WHEN NOT MATCHED THEN
        |   INSERT(customer_id, name, record_change_timestamp)
        |   VALUES(s.customer_id, s.name, s.record_change_timestamp)""".stripMargin)
    val got = t.toDF.orderBy("customer_id").as[(Long, String, Int)].collect().toSeq
    assert(got == Seq(
      (1L, "customer_a", 1),
      (2L, "customer_b-updated(with merge sql)", 2),
      (3L, "customer_b", 2)))
  }

  test("reference DELETE SQL (IcebergSQLDelete.java:32)") {
    val (g, t) = freshTable("del")
    g.sql("INSERT INTO test_table select 1, 'customer_a-V1', 'lastname-1'")
    g.sql("INSERT INTO test_table select 1, 'customer_a-V3', 'lastname-1'")
    g.sql("INSERT INTO test_table select 1, 'customer_a-V3', 'lastname-2'")
    g.sql("INSERT INTO test_table select 2, 'customer_b', 'lastname-2'")
    g.sql("INSERT INTO test_table select 3, 'customer_c', 'lastname-3'")
    g.sql("DELETE FROM test_table WHERE customer_id = 1 and name = 'customer_a-V3'")
    assert(t.toDF.count() == 3)
    assert(t.toDF.filter($"name" === "customer_a-V3").count() == 0)
    // drop column after delete, like the reference (IcebergSQLDelete.java:35)
    t.dropColumn("name")
    assert(t.toDF.columns.toSeq == Seq("customer_id", "lastname"))
  }

  test("reference SCD2 SQL pipeline, dotted table names (IcebergSCD2.java:15-71)") {
    val g = GraftSql(spark)
    val dim = GraftTable.create(spark, TestSpark.tmpDir("sql_scd2"), StructType(Seq(
      StructField("customer_id", LongType), StructField("name", StringType),
      StructField("current", BooleanType), StructField("effective_date", DateType),
      StructField("end_date", DateType))))
    val stg = GraftTable.create(spark, TestSpark.tmpDir("sql_scd2_stg"), StructType(Seq(
      StructField("customer_id", LongType), StructField("name", StringType),
      StructField("effective_date", DateType))))
    g.register("default.scd2_table", dim).register("default.stg_scd2_table", stg)
    g.sql("INSERT INTO default.scd2_table select 1, 'customer_a-V1', false, to_date('2020-01-01', 'yyyy-MM-dd'), to_date('2020-01-12', 'yyyy-MM-dd')")
    g.sql("INSERT INTO default.scd2_table select 1, 'customer_a-V2', true, to_date('2020-01-12', 'yyyy-MM-dd'), to_date('9999-12-31', 'yyyy-MM-dd')")
    g.sql("INSERT INTO default.scd2_table select 2, 'customer_b-V1', true, to_date('2020-01-01', 'yyyy-MM-dd'), to_date('9999-12-31', 'yyyy-MM-dd')")
    g.sql("INSERT INTO default.stg_scd2_table select 1, 'customer_a-V3', to_date('2020-02-15', 'yyyy-MM-dd')")
    g.sql("INSERT INTO default.stg_scd2_table select 2, 'customer_b-V2', to_date('2020-02-15', 'yyyy-MM-dd')")
    g.sql("INSERT INTO default.stg_scd2_table select 3, 'customer_c-V1', to_date('2020-02-15', 'yyyy-MM-dd')")
    g.sql(
      """MERGE INTO default.scd2_table t
        |USING (
        |    SELECT customer_id, name, effective_date, to_date('9999-12-31', 'yyyy-MM-dd') as end_date FROM default.stg_scd2_table
        |    UNION ALL
        |    SELECT t.customer_id, t.name, t.effective_date, s.effective_date as end_date FROM default.stg_scd2_table s
        |    INNER JOIN default.scd2_table t on s.customer_id = t.customer_id AND t.current = true
        |) s
        |ON s.customer_id = t.customer_id AND s.effective_date = t.effective_date
        |WHEN MATCHED
        |  THEN UPDATE SET t.current = false, t.end_date = s.end_date
        |WHEN NOT MATCHED THEN
        |   INSERT(customer_id, name, current, effective_date, end_date)
        |   VALUES(s.customer_id, s.name, true, s.effective_date, s.end_date)""".stripMargin)
    val got = dim.toDF.orderBy("customer_id", "effective_date")
      .selectExpr("customer_id", "name", "current", "CAST(effective_date AS STRING)", "CAST(end_date AS STRING)")
      .as[(Long, String, Boolean, String, String)].collect().toSeq
    // the post-state the reference's AFTER show() prints
    assert(got == Seq(
      (1L, "customer_a-V1", false, "2020-01-01", "2020-01-12"),
      (1L, "customer_a-V2", false, "2020-01-12", "2020-02-15"),
      (1L, "customer_a-V3", true, "2020-02-15", "9999-12-31"),
      (2L, "customer_b-V1", false, "2020-01-01", "2020-02-15"),
      (2L, "customer_b-V2", true, "2020-02-15", "9999-12-31"),
      (3L, "customer_c-V1", true, "2020-02-15", "9999-12-31")))
  }

  test("UPDATE SQL and MERGE WHEN NOT MATCHED BY SOURCE") {
    val (g, t) = freshTable("upd")
    g.sql("INSERT INTO test_table select 1, 'customer_a', 'l1'")
    g.sql("INSERT INTO test_table select 2, 'customer_b', 'l2'")
    g.sql("INSERT INTO test_table select 3, 'customer_c', 'l3'")
    // standalone UPDATE
    g.sql("UPDATE test_table SET name = concat(name, '-upd') WHERE customer_id >= 2")
    assert(t.toDF.filter($"name".endsWith("-upd")).count() == 2)
    // not-matched-by-source DELETE: source only carries key 1 → 2,3 deleted
    g.sql(
      """MERGE INTO test_table t
        |USING (SELECT 1 as customer_id, 'customer_a-v2' as name, 'l1x' as lastname) s
        |ON s.customer_id = t.customer_id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val got = t.toDF.orderBy("customer_id").as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "customer_a-v2", "l1x")))
    // not-matched-by-source UPDATE (tombstone the rest instead of deleting)
    g.sql("INSERT INTO test_table select 9, 'customer_z', 'l9'")
    g.sql(
      """MERGE INTO test_table t
        |USING (SELECT 1 as customer_id) s
        |ON s.customer_id = t.customer_id
        |WHEN NOT MATCHED BY SOURCE AND t.customer_id > 5 THEN UPDATE SET t.lastname = 'orphan'""".stripMargin)
    assert(t.toDF.filter($"lastname" === "orphan").as[(Long, String, String)]
      .collect().map(_._1).toSeq == Seq(9L))
  }

  test("reference CREATE TABLE DDL: full SQL-only flow (IcebergSQLMerge.java:17-48)") {
    val g = GraftSql(spark)
    // the reference's exact DDL text, partition transforms included
    g.sql("""CREATE TABLE default.test_table (
            |    customer_id bigint COMMENT 'unique id',
            |    name string,
            |    lastname string
            |) USING iceberg""".stripMargin)
    g.sql("INSERT INTO default.test_table select 1, 'customer_a', 'lastname-1'")
    g.sql(
      """MERGE INTO default.test_table t
        |USING (SELECT 2 as customer_id, 'customer_b' as name, 'lastname-2' as lastname) s
        |ON s.customer_id = t.customer_id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = g.sql("SELECT count(*) AS n FROM default__test_table").as[Long].head()
    assert(got == 2)
    assert(g.table("default.test_table").toDF.count() == 2)
    // duplicate create errors; IF NOT EXISTS is a no-op
    assertThrows[IllegalStateException] {
      g.sql("CREATE TABLE default.test_table (x int) USING iceberg")
    }
    g.sql("CREATE TABLE IF NOT EXISTS default.test_table (x int) USING iceberg")
    // partitioned create + CTAS
    g.sql("""CREATE TABLE default.events_p (id bigint, d date)
            |USING graft PARTITIONED BY (months(d), bucket(4, id))""".stripMargin)
    assert(g.table("default.events_p").spec.map(_.transform) == Seq("month", "bucket"))
    g.sql("CREATE TABLE default.copy AS SELECT * FROM default.test_table")
    assert(g.table("default.copy").toDF.count() == 2)
  }

  test("reference ALTER TABLE SQL: ADD COLUMN then DROP COLUMN") {
    val (g, t) = freshTable("alter")
    g.sql("INSERT INTO test_table select 1, 'customer_a', 'lastname-1'")
    // IcebergSQLMerge.java:69
    g.sql("ALTER TABLE test_table ADD COLUMN email string")
    assert(t.schema.fieldNames.toSeq ==
      Seq("customer_id", "name", "lastname", "email"))
    assert(t.toDF.filter($"email".isNull).count() == 1)
    // IcebergSQLDelete.java:35
    g.sql("ALTER TABLE test_table DROP COLUMN name")
    assert(t.schema.fieldNames.toSeq == Seq("customer_id", "lastname", "email"))
    assert(g.sql("SELECT * FROM test_table").columns.toSeq ==
      Seq("customer_id", "lastname", "email"))
    g.sql("ALTER TABLE test_table RENAME COLUMN lastname TO surname")
    assert(t.schema.fieldNames.toSeq == Seq("customer_id", "surname", "email"))
    assert(g.sql("SELECT surname FROM test_table").as[String].collect().toSeq ==
      Seq("lastname-1"))
  }

  test("INSERT OVERWRITE replaces; INSERT with column list maps by name") {
    val (g, t) = freshTable("insover")
    g.sql("INSERT INTO test_table select 1, 'a', 'l1'")
    g.sql("INSERT OVERWRITE test_table select 9, 'z', 'l9'")
    assert(t.toDF.as[(Long, String, String)].collect().toSeq == Seq((9L, "z", "l9")))
    // explicit column list in a different order than the schema
    g.sql("INSERT INTO test_table (name, customer_id, lastname) select 'named', 5, 'l5'")
    val row5 = t.toDF.filter($"customer_id" === 5L).as[(Long, String, String)].head()
    assert(row5 == ((5L, "named", "l5")))
  }

  test("MERGE ON with differently-named keys (ON s.id = t.customer_id)") {
    val (g, t) = freshTable("mkeys")
    g.sql("INSERT INTO test_table VALUES (1, 'a', 'l1'), (2, 'b', 'l2')")
    g.sql(
      """MERGE INTO test_table t
        |USING (
        |  SELECT 2 AS id, 'b-upd' AS name
        |  UNION ALL
        |  SELECT 3 AS id, 'c-new' AS name
        |) s
        |ON s.id = t.customer_id
        |WHEN MATCHED THEN UPDATE SET t.name = s.name
        |WHEN NOT MATCHED THEN INSERT (customer_id, name) VALUES (s.id, s.name)""".stripMargin)
    val got = t.toDF.orderBy("customer_id")
      .select("customer_id", "name", "lastname")
      .as[(Long, String, Option[String])].collect().toSeq
    assert(got == Seq((1L, "a", Some("l1")), (2L, "b-upd", Some("l2")),
      (3L, "c-new", None)))
  }

  test("SELECT passthrough sees registered table state") {
    val (g, t) = freshTable("sel")
    g.sql("INSERT INTO test_table select 1, 'a', 'b'")
    val n = g.sql("SELECT count(*) AS n FROM test_table").as[Long].head()
    assert(n == 1)
  }

  test("ALTER TABLE WRITE ORDERED BY and skipping-metadata TBLPROPERTIES") {
    val (g, t) = freshTable("ddl2")
    g.sql("ALTER TABLE test_table WRITE ORDERED BY (customer_id)")
    assert(t.sortKey == Seq("customer_id"))
    g.sql("ALTER TABLE test_table WRITE UNORDERED")
    assert(t.sortKey.isEmpty)
    g.sql("ALTER TABLE test_table SET TBLPROPERTIES('graft.stats-keys'='customer_id'," +
      "'graft.bloom-keys'='name')")
    assert(t.snapshot.statsKeys == Seq("customer_id"))
    assert(t.snapshot.bloomKeys == Seq("name"))
    g.sql("INSERT INTO test_table VALUES (1, 'a', 'x'), (900, 'b', 'y')")
    // the declared stats captured on the write: a range scan prunes
    import org.apache.spark.sql.functions.col
    assert(t.scan(col("customer_id") > 100L).count() == 1)
    // non-graft keys land as free-form snapshot-log properties (round 14)
    g.sql("ALTER TABLE test_table SET TBLPROPERTIES('retention.days'='30')")
    assert(t.properties("retention.days") == "30")
    g.sql("ALTER TABLE test_table UNSET TBLPROPERTIES('retention.days')")
    assert(!t.properties.contains("retention.days"))
  }

  test("ALTER TABLE ADD/DROP/REPLACE PARTITION FIELD (spec evolution syntax)") {
    import graft.table.PartitionField
    val (g, t) = freshTable("specddl")
    g.sql("INSERT INTO test_table VALUES (1, 'a', 'x'), (2, 'b', 'y')")
    g.sql("ALTER TABLE test_table ADD PARTITION FIELD truncate(1, name)")
    assert(t.spec == Seq(PartitionField("name", "truncate", 1)))
    g.sql("INSERT INTO test_table VALUES (3, 'c', 'z')")
    assert(g.sql("SELECT count(*) AS n FROM test_table").as[Long].head() == 3)
    g.sql("ALTER TABLE test_table REPLACE PARTITION FIELD truncate(1, name) WITH bucket(4, customer_id)")
    assert(t.spec == Seq(PartitionField("customer_id", "bucket", 4)))
    g.sql("ALTER TABLE test_table DROP PARTITION FIELD bucket(4, customer_id)")
    assert(t.spec.isEmpty)
    // three set-spec commits, data intact under all historical layouts
    assert(t.toDF.count() == 3)
    val e = intercept[IllegalArgumentException] {
      g.sql("ALTER TABLE test_table DROP PARTITION FIELD month(nope)")
    }
    assert(e.getMessage.contains("no such partition field"))
  }

  test("CREATE TABLE IF NOT EXISTS ... AS SELECT is a no-op on an existing table") {
    val g = GraftSql(spark)
    g.sql("CREATE TABLE IF NOT EXISTS ctas_t AS SELECT 1 AS id, 'a' AS v")
    assert(g.sql("SELECT * FROM ctas_t").count() == 1)
    // idempotent bootstrap re-run: the existing table must stay untouched
    g.sql("CREATE TABLE IF NOT EXISTS ctas_t AS SELECT 1 AS id, 'a' AS v")
    assert(g.sql("SELECT * FROM ctas_t").count() == 1,
      "re-running CTAS IF NOT EXISTS duplicated rows")
    // without IF NOT EXISTS it still refuses
    intercept[IllegalStateException] {
      g.sql("CREATE TABLE ctas_t AS SELECT 2 AS id, 'b' AS v")
    }
  }

  test("DELETE and UPDATE accept alias- and table-qualified conditions") {
    val (g, t) = freshTable("qual")
    g.sql("INSERT INTO test_table select 1, 'a', 'x'")
    g.sql("INSERT INTO test_table select 2, 'b', 'y'")
    g.sql("INSERT INTO test_table select 3, 'c', 'z'")
    g.sql("UPDATE test_table SET name = 'b2' WHERE test_table.customer_id = 2")
    assert(t.toDF.filter(org.apache.spark.sql.functions.col("name") === "b2").count() == 1)
    // alias-qualified DELETE used to die with UNRESOLVED_COLUMN (the
    // condition filters the unaliased frame): must strip the qualifier
    g.sql("DELETE FROM test_table t WHERE t.customer_id = 1")
    assert(t.toDF.count() == 2, "alias-qualified DELETE did not apply")
    g.sql("DELETE FROM test_table WHERE test_table.customer_id = 3")
    assert(t.toDF.count() == 1, "table-qualified DELETE did not apply")
  }

  test("DELETE/UPDATE qualifier stripping works for dotted registered names") {
    val g = GraftSql(spark)
    val t = GraftTable.create(spark, TestSpark.tmpDir("sql_dotted"), StructType(Seq(
      StructField("customer_id", LongType), StructField("name", StringType),
      StructField("lastname", StringType))))
    g.register("db.tq", t)
    (1 to 4).foreach(i => g.sql(s"INSERT INTO db.tq select $i, 'c$i', 'l$i'"))
    // last-segment qualifier against a dotted registered name
    g.sql("DELETE FROM db.tq WHERE tq.customer_id = 1")
    assert(t.toDF.count() == 3, "last-segment-qualified DELETE did not apply")
    // full dotted qualifier
    g.sql("DELETE FROM db.tq WHERE db.tq.customer_id = 2")
    assert(t.toDF.count() == 2, "fully-qualified DELETE did not apply")
    g.sql("UPDATE db.tq SET name = 'upd' WHERE tq.customer_id = 3")
    assert(t.toDF.filter(org.apache.spark.sql.functions.col("name") === "upd").count() == 1,
      "last-segment-qualified UPDATE did not apply")
  }
}
