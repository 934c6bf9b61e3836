package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** `events.ts` has changed physical type across fixture generations:
    * Parquet TIMESTAMP(NANOS) (reads as int64 ns under the legacy flag —
    * Spark 4 rejects NANOS otherwise) and TIMESTAMP(MICROS, NTZ) (reads
    * as TIMESTAMP_NTZ; the flag is a no-op for MICROS). We keep the flag
    * set so BOTH generations load, and [[eventsWithTs]] probes the
    * resolved type instead of assuming one. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
  }

  /** Epoch-microseconds Column for whatever `ts` resolved to in `df`'s
    * schema (works on batch and streaming frames alike). The NTZ branch
    * uses date/extract arithmetic rather than
    * `unix_micros(cast(ts as timestamp))` so the epoch value cannot
    * silently depend on `spark.sql.session.timeZone` — the wall-clock
    * value is treated as UTC, matching DuckDB's `epoch_us(ts)` on the
    * same file. */
  def tsUsExpr(df: DataFrame): Column = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => expr("ts div 1000") // legacy NANOS fixture: int64 ns → µs
      case TimestampNTZType => expr(
        "unix_date(cast(ts as date)) * 86400000000L" +
          " + (extract(HOUR from ts) * 3600 + extract(MINUTE from ts) * 60) * 1000000L" +
          " + cast(extract(SECOND from ts) * 1000000 as bigint)")
      case TimestampType => unix_micros(col("ts")) // instant: already tz-free
      case other => throw new IllegalStateException(
        s"events.ts resolved to unsupported type $other — extend Tables.tsUsExpr")
    }
  }

  /** Adds `ts_us` (epoch microseconds, bigint) and `ts_micro`
    * (TimestampType) derived from whatever `ts` resolved to. All
    * downstream event queries use only `ts_us`/`ts_micro`, never raw
    * `ts`. */
  def eventsWithTs(spark: SparkSession, dir: String): DataFrame = {
    val df = events(spark, dir)
    df.withColumn("ts_us", tsUsExpr(df))
      .withColumn("ts_micro", timestamp_micros(col("ts_us")))
  }

  /** Fresh temp dir for per-query table state (harness queries must never
    * write into the read-only sfDir). */
  def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$name").toString + "/t"
}
