package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loaders over the driver-generated parquet dirs
  * (`/root/repo/TESTDATA.md`). All reads are plain vectorized parquet
  * scans; callers filter/project and Catalyst pushes both down. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def customer(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "customer")
  def orders(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "lineitem")
  def nation(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")

  /** `events.ts` is Parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default; with the legacy flag it reads as bigint nanoseconds. We keep
    * it as int64 ns and derive `ts_us` (microseconds) where timestamp
    * semantics are needed — integer math, exactly matching what DuckDB
    * sees after its ns→µs truncation on read. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
  }

  def eventsWithTs(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_micro", timestamp_micros(expr("ts div 1000")))

  /** Fresh temp dir for per-query table state (harness queries must never
    * write into the read-only sfDir). */
  def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$name").toString + "/t"
}
