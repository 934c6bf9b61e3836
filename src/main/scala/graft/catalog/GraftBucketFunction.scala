package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** The catalog-served `bucket(n, col)` V2 function — the function identity
  * behind storage-partitioned joins. Spark resolves a scan-reported
  * `bucket` partition transform against the table catalog's
  * FunctionCatalog; two scans whose transforms bind to the same
  * `canonicalName` (and bucket count) are recognized as co-partitioned and
  * join WITHOUT a shuffle (the Iceberg bucket-join capability,
  * `/root/reference/src/main/java/IcebergHadoopTables.java:27`).
  *
  * Semantics are exactly the write-side transform
  * ([[graft.table.PartitionField.exprFor]]): `pmod(hash(col), n)` with
  * Spark's `hash` = Murmur3-32 at seed 42 — so the function evaluated on
  * a row agrees with the value in the file layout.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(murmur3_hash(col, 42), n) — graft's partition bucket transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets int, value), got ${inputType.catalogString}")
    val dt = inputType.fields(1).dataType
    dt match {
      case LongType | IntegerType | DateType | ShortType | ByteType | StringType =>
        new GraftBucketBound(dt)
      case other => throw new UnsupportedOperationException(
        s"bucket transform not supported for type ${other.catalogString}")
    }
  }
}

private final class GraftBucketBound(dt: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.bucket(${dt.catalogString})"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    // Murmur3-32 seed 42 per input type — mirrors catalyst's Murmur3Hash
    // (what functions.hash compiles to), so this matches written layouts
    val h = dt match {
      case LongType => Murmur3_x86_32.hashLong(input.getLong(1), 42)
      case IntegerType | DateType => Murmur3_x86_32.hashInt(input.getInt(1), 42)
      case ShortType => Murmur3_x86_32.hashInt(input.getShort(1).toInt, 42)
      case ByteType => Murmur3_x86_32.hashInt(input.getByte(1).toInt, 42)
      case StringType =>
        val s = input.getUTF8String(1)
        Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    ((h % n) + n) % n
  }
}
