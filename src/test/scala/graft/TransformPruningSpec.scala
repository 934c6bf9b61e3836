package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.table._

class TransformPruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  def partitionedOrders(): GraftTable = {
    val dir = TestSpark.tmpDir("tp-orders")
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_orderdate", DateType),
      StructField("o_name", StringType)))
    val t = GraftTable.create(spark, dir, schema, spec = Seq(
      PartitionField("o_orderdate", "month"),
      PartitionField("o_name", "truncate", 3),
      PartitionField("o_orderkey", "bucket", 4)))
    val rows = (0 until 300).map { i =>
      (i.toLong, java.sql.Date.valueOf(f"2020-${i % 12 + 1}%02d-15"), s"cust${i % 7}")
    }
    t.append(rows.toDF("o_orderkey", "o_orderdate", "o_name"))
    t
  }

  test("scan(pred) returns the same rows as toDF.filter(pred)") {
    val t = partitionedOrders()
    val preds = Seq(
      col("o_orderdate") === java.sql.Date.valueOf("2020-03-15"),
      col("o_orderdate") > java.sql.Date.valueOf("2020-06-01") &&
        col("o_orderdate") <= java.sql.Date.valueOf("2020-09-30"),
      col("o_name") === "cust3" && col("o_orderkey") < 100L,
      col("o_orderkey") === 42L,
      col("o_orderdate").isin(java.sql.Date.valueOf("2020-01-15"),
        java.sql.Date.valueOf("2020-02-15")))
    preds.foreach { p =>
      val a = t.scan(p).orderBy("o_orderkey").collect().toSeq
      val b = t.toDF.filter(p).orderBy("o_orderkey").collect().toSeq
      assert(a == b, s"pred $p")
      assert(a.nonEmpty, s"pred $p should match rows (fixture bug otherwise)")
    }
  }

  test("derived predicate reaches the parquet scan (PushedFilters)") {
    val t = partitionedOrders()
    val plan = t.scan(col("o_orderdate") === java.sql.Date.valueOf("2020-03-15"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("o_orderdate_month"),
      s"derived month predicate missing from plan:\n$plan")
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("o_orderdate_month"),
      s"derived predicate not pushed to scan: $pushed")
  }

  test("scan prunes partition DIRECTORIES: non-matching dirs are never listed") {
    val t = partitionedOrders()
    val all = t.toDF.inputFiles.length
    val pruned = t.scan(col("o_orderdate") === java.sql.Date.valueOf("2020-03-15"))
    val files = pruned.inputFiles
    assert(files.nonEmpty && files.length < all,
      s"expected fewer input files than $all, got ${files.length}")
    // every surviving file sits under the matching month dir
    assert(files.forall(_.contains("__dir_o_orderdate_month=2020-03")),
      s"unpruned file paths:\n${files.filterNot(_.contains("2020-03")).take(3).mkString("\n")}")
    // identity + multi-transform: a no-match predicate lists nothing
    assert(t.scan(col("o_orderdate") === java.sql.Date.valueOf("2031-01-01")).count() == 0)
  }

  test("scan dir pruning survives appends and mixed predicates") {
    val t = partitionedOrders()
    t.append(Seq((1000L, java.sql.Date.valueOf("2020-03-15"), "late"))
      .toDF("o_orderkey", "o_orderdate", "o_name"))
    val got = t.scan(col("o_orderdate") === java.sql.Date.valueOf("2020-03-15")
        && col("o_orderkey") >= 900L)
      .select("o_orderkey").as[Long].collect().toSeq
    assert(got == Seq(1000L))
  }

  test("scanAsOf: pinned-version pruned scan — old content, still pruned, " +
    "expired versions refuse") {
    val t = partitionedOrders()
    val preV = t.currentVersion
    val pred = col("o_orderdate") === java.sql.Date.valueOf("2020-03-15")
    t.append(Seq((1000L, java.sql.Date.valueOf("2020-03-15"), "late"))
      .toDF("o_orderkey", "o_orderdate", "o_name"))
    // pinned scan answers from the OLD snapshot (the manifest-reader
    // protocol: resolve once, read exactly that version)...
    val pinned = t.scanAsOf(preV, pred).select("o_orderkey").as[Long].collect().toSet
    val expect = t.asOf(preV).filter(pred).select("o_orderkey").as[Long].collect().toSet
    assert(pinned == expect && !pinned.contains(1000L))
    assert(t.scan(pred).select("o_orderkey").as[Long].collect().toSet.contains(1000L))
    // ...and still prunes partition dirs at the pinned version
    val files = t.scanAsOf(preV, pred).inputFiles
    assert(files.nonEmpty && files.forall(_.contains("__dir_o_orderdate_month=2020-03")),
      s"pinned scan did not prune:\n${files.take(3).mkString("\n")}")
    // an expired version refuses cleanly instead of reading ghost dirs
    t.expireSnapshots(1)
    val e = intercept[Exception] { t.scanAsOf(preV, pred).collect() }
    assert(e.getMessage.contains("expired"), e.getMessage)
  }

  test("bucket pruning hashes the literal at the SOURCE column's type") {
    // o_orderkey is LongType; an Int literal must hash like the Long value
    // (Murmur3 hashes Int 42 and Long 42L differently)
    val t = partitionedOrders()
    val viaInt = t.scan(col("o_orderkey") === 42)
      .select("o_orderkey").as[Long].collect().toSeq
    val viaLong = t.scan(col("o_orderkey") === 42L)
      .select("o_orderkey").as[Long].collect().toSeq
    assert(viaInt == Seq(42L) && viaLong == Seq(42L))
  }

  test("unsound derivations are not produced") {
    val t = partitionedOrders()
    // range on a bucket source must NOT derive (hash kills ordering)
    val spec = Seq(PartitionField("o_orderkey", "bucket", 4))
    val schema = StructType(Seq(StructField("o_orderkey", LongType)))
    assert(TransformPruning.derive(spec, schema, col("o_orderkey") > 10L).isEmpty)
    // OR with one underivable branch must NOT derive for that transform
    val mixed = TransformPruning.derive(spec, schema,
      col("o_orderkey") === 1L || col("o_orderkey") > 10L)
    assert(mixed.isEmpty)
  }

  test("month pruning on TIMESTAMP reads instant literals in the SESSION " +
    "time zone — boundary instants stay findable under a shifted zone") {
    // regression: monthOf used UTC (Instant) / the JVM default zone
    // (java.sql.Timestamp) while the write side's date_format uses the
    // session zone, so an instant within hours of a month boundary
    // derived the WRONG ts_month, pruned the dir that holds the row, AND
    // mis-filtered the scan (the derived predicate is conjoined)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val dir = TestSpark.tmpDir("tp-tz")
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("ts", TimestampType)))
      val t = GraftTable.create(spark, dir, schema,
        spec = Seq(PartitionField("ts", "month")))
      // 2020-04-01T03:00:00Z = 2020-03-31T20:00 in LA → written under
      // ts_month=2020-03; a UTC reading of the same literal says 2020-04
      val boundary = java.sql.Timestamp.from(
        java.time.Instant.parse("2020-04-01T03:00:00Z"))
      val plain = java.sql.Timestamp.from(
        java.time.Instant.parse("2020-06-15T12:00:00Z"))
      t.append(Seq((1L, boundary), (2L, plain)).toDF("id", "ts"))
      assert(t.scan(col("ts") === boundary).count() == 1,
        "boundary instant lost to a wrong-zone month derivation")
      assert(t.scan(col("ts") === java.time.Instant.parse("2020-04-01T03:00:00Z"))
        .count() == 1, "Instant literal lost to a wrong-zone month derivation")
      assert(t.scan(col("ts") >= boundary).count() == 2)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
