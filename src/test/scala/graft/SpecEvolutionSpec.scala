package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.table.{GraftTable, PartitionField}

/** Partition-spec evolution: `updateSpec` is metadata-only — old dirs
  * keep their layout and are pruned/read under the spec in force when
  * they were committed; new writes use the new spec. Ops that interpret
  * the layout globally (dynamic overwrite, SPJ, cherry-pick across a
  * spec change) refuse rather than mis-prune. */
class SpecEvolutionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_specev_$tag").toString + "/t"

  private def day(s: String) = java.sql.Date.valueOf(s)

  private def mkEvolved(): GraftTable = {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("d", DateType), StructField("cat", StringType)))
    val t = GraftTable.create(spark, tmp("ev"), schema,
      spec = Seq(PartitionField("d", "month")))
    t.append(Seq((1L, day("2020-01-05"), "a"), (2L, day("2020-02-05"), "b")).toDF("id", "d", "cat"))
    t.updateSpec(Seq(PartitionField("cat", "identity")))
    t.append(Seq((3L, day("2020-01-09"), "a"), (4L, day("2020-03-09"), "b")).toDF("id", "d", "cat"))
    t
  }

  test("updateSpec is metadata-only; reads see all rows under both layouts") {
    val t = mkEvolved()
    assert(t.toDF.count() == 4)
    assert(t.spec == Seq(PartitionField("cat", "identity")))
    // old dirs still governed by the month spec
    val s = t.snapshot
    val old = s.dataDirs.minBy(_.version)
    assert(s.specAt(old.version) == Seq(PartitionField("d", "month")))
    assert(!s.uniformSpec)
  }

  test("scan prunes each dir group by its own spec, results stay exact") {
    val t = mkEvolved()
    // date predicate: derivable for the OLD month-spec dirs only
    val jan = t.scan(col("d") < lit(day("2020-02-01")))
    assert(jan.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // cat predicate: derivable for the NEW identity-spec dirs only
    val cats = t.scan(col("cat") === "b")
    assert(cats.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
    // combined
    assert(t.scan(col("cat") === "a" && col("d") < lit(day("2020-02-01")))
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("delete across a spec change rewrites only matching dirs, correctly") {
    val t = mkEvolved()
    t.delete(col("cat") === "a")
    assert(t.toDF.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
  }

  test("dynamic overwrite and cherry-pick refuse across a spec change") {
    val t = mkEvolved()
    val e1 = intercept[IllegalArgumentException] {
      t.overwriteDynamic(Seq((9L, day("2020-01-01"), "a")).toDF("id", "d", "cat"))
    }
    assert(e1.getMessage.contains("older partition spec"))
    // roll back to the month-spec state, then try to re-apply the append
    // that was written under the identity spec (v3)
    t.rollbackTo(1)
    val e2 = intercept[IllegalArgumentException] { t.cherryPick(3) }
    assert(e2.getMessage.contains("partition spec"))
  }

  test("publishStaged refuses when the spec evolved after staging") {
    val schema = StructType(Seq(StructField("id", LongType), StructField("cat", StringType)))
    val t = GraftTable.create(spark, tmp("wap"), schema)
    t.append(Seq((1L, "a")).toDF("id", "cat"))
    val staged = t.stageAppend(Seq((2L, "b")).toDF("id", "cat"))
    t.updateSpec(Seq(PartitionField("cat", "identity")))
    val e = intercept[IllegalArgumentException] { t.publishStaged(staged) }
    assert(e.getMessage.contains("different partition spec"))
    t.abortStaged(staged)
  }

  test("specLog round-trips the log and survives reload") {
    val t = mkEvolved()
    val t2 = GraftTable.load(spark, t.dir)
    val s = t2.snapshot
    assert(s.specLog.length == 2)
    assert(s.specLog.head._2 == Seq(PartitionField("d", "month")))
    assert(s.specLog.last._2 == Seq(PartitionField("cat", "identity")))
    assert(t2.toDF.count() == 4)
  }

  test("rollback across a spec change restores the old spec for new writes") {
    val t = mkEvolved()
    val verAfterFirstAppend = 1
    t.rollbackTo(verAfterFirstAppend)
    assert(t.spec == Seq(PartitionField("d", "month")))
    assert(t.toDF.count() == 2)
    // writes after the rollback lay out under the restored spec and prune
    t.append(Seq((5L, day("2021-05-05"), "c")).toDF("id", "d", "cat"))
    assert(t.scan(col("d") >= lit(day("2021-01-01")))
      .select("id").as[Long].collect().toSeq == Seq(5L))
  }
}
