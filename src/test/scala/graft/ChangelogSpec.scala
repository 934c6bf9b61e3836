package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable

/** Row-level CDC changelog ([[GraftTable.changesBetween]]): inserts come
  * from the range's data dirs, delete pre-images from a keyed semi-join
  * against the parent snapshot. */
class ChangelogSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("changelog-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_cdc").toString + "/t"

  test("upsert reads as delete(pre-image) + insert(new)") {
    val t = GraftTable.create(spark, tmp(), schema, key = Seq("id"), formatVersion = 2)
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")) // v1
    t.rowDelta(Seq(2L).toDF("id"), Seq((2L, "b2")).toDF("id", "v"), Seq("id")) // v2
    val got = t.changesBetween(0, 2)
      .select($"id", $"v", $"_change_type", $"_commit_version")
      .orderBy("_commit_version", "_change_type", "id")
      .as[(Long, String, String, Int)].collect().toSeq
    assert(got == Seq(
      (1L, "a", "insert", 1), (2L, "b", "insert", 1), (3L, "c", "insert", 1),
      (2L, "b", "delete", 2), (2L, "b2", "insert", 2)))
  }

  test("range scoping: only commits in (from, to] appear") {
    val t = GraftTable.create(spark, tmp(), schema, key = Seq("id"), formatVersion = 2)
    t.append(Seq((1L, "a")).toDF("id", "v"))  // v1
    t.append(Seq((2L, "b")).toDF("id", "v"))  // v2
    t.rowDelta(Seq(1L).toDF("id"), Seq((1L, "a2")).toDF("id", "v"), Seq("id")) // v3
    val got = t.changesBetween(1, 3)
      .select($"id", $"v", $"_change_type", $"_commit_version")
      .orderBy("_commit_version", "_change_type", "id")
      .as[(Long, String, String, Int)].collect().toSeq
    assert(got == Seq(
      (2L, "b", "insert", 2),
      (1L, "a", "delete", 3), (1L, "a2", "insert", 3)))
    // delete pre-image respects deletes already applied BEFORE the range:
    assert(t.changesBetween(2, 3).count() == 2) // delete(1,a) + insert(1,a2)
    assert(t.changesBetween(3, 3).count() == 0) // empty range
  }

  test("crossing an overwrite commit raises") {
    val t = GraftTable.create(spark, tmp(), schema)
    t.append(Seq((1L, "a")).toDF("id", "v"))  // v1
    t.overwrite(Seq((9L, "z")).toDF("id", "v")) // v2
    val e = intercept[IllegalArgumentException] { t.changesBetween(0, 2) }
    assert(e.getMessage.contains("overwrite"))
  }

  test("crossing a rollback commit raises (removed rows are inexpressible)") {
    val t = GraftTable.create(spark, tmp(), schema)
    t.append(Seq((1L, "a")).toDF("id", "v"))  // v1
    t.append(Seq((2L, "b")).toDF("id", "v"))  // v2
    t.rollbackTo(1)                            // v3 drops (2,b)
    val e = intercept[IllegalArgumentException] { t.changesBetween(2, 3) }
    assert(e.getMessage.contains("rollback"))
  }

  test("expired pre-image parent raises instead of silently dropping deletes") {
    val t = GraftTable.create(spark, tmp(), schema, key = Seq("id"), formatVersion = 2)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))                        // v1
    t.rowDelta(Seq(2L).toDF("id"), Seq((2L, "b2")).toDF("id", "v"), Seq("id")) // v2
    t.append(Seq((3L, "c")).toDF("id", "v"))                                   // v3
    t.expireSnapshots(keepLast = 2)
    val e = intercept[IllegalArgumentException] { t.changesBetween(1, 3) }
    assert(e.getMessage.contains("expired"))
  }

  test("rename between delete and read: pre-images align to the new names") {
    val t = GraftTable.create(spark, tmp(), schema, key = Seq("id"), formatVersion = 2)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))                        // v1
    t.rowDelta(Seq(2L).toDF("id"), Seq((2L, "b2")).toDF("id", "v"), Seq("id")) // v2
    t.renameColumn("v", "w")                                                   // v3
    val out = t.changesBetween(0, 3)
    assert(out.columns.toSeq ==
      Seq("id", "w", "_change_type", "_commit_version")) // no phantom old-name column
    val got = out.orderBy("_commit_version", "_change_type", "id")
      .as[(Long, String, String, Int)].collect().toSeq
    assert(got == Seq(
      (1L, "a", "insert", 1), (2L, "b", "insert", 1),
      (2L, "b", "delete", 2), (2L, "b2", "insert", 2)))
  }

  test("read surface: format(graft).option(changesFrom/changesTo)") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, schema, key = Seq("id"), formatVersion = 2)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))                        // v1
    t.rowDelta(Seq(2L).toDF("id"), Seq((2L, "b2")).toDF("id", "v"), Seq("id")) // v2
    val got = spark.read.format("graft")
      .option("changesFrom", 1).load(dir) // changesTo defaults to current
      .orderBy("_change_type", "id")
      .select($"id", $"v", $"_change_type", $"_commit_version")
      .as[(Long, String, String, Int)].collect().toSeq
    assert(got == Seq((2L, "b", "delete", 2), (2L, "b2", "insert", 2)))
    assert(spark.read.format("graft")
      .option("changesFrom", 0).option("changesTo", 1).load(dir).count() == 2)
  }

  test("chained upserts recover each pre-image from its own parent state") {
    val t = GraftTable.create(spark, tmp(), schema, key = Seq("id"), formatVersion = 2)
    t.append(Seq((1L, "a")).toDF("id", "v"))                                   // v1
    t.rowDelta(Seq(1L).toDF("id"), Seq((1L, "a2")).toDF("id", "v"), Seq("id")) // v2
    t.rowDelta(Seq(1L).toDF("id"), Seq((1L, "a3")).toDF("id", "v"), Seq("id")) // v3
    val got = t.changesBetween(0, 3)
      .select($"id", $"v", $"_change_type", $"_commit_version")
      .orderBy("_commit_version", "_change_type", "v")
      .as[(Long, String, String, Int)].collect().toSeq
    assert(got == Seq(
      (1L, "a", "insert", 1),
      (1L, "a", "delete", 2), (1L, "a2", "insert", 2),
      (1L, "a2", "delete", 3), (1L, "a3", "insert", 3)))
  }
}
