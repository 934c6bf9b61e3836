package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Tables

/** Probe of the driver-generated fixtures' loader-visible logical types.
  *
  * The round-4 outage happened because a fixture regeneration silently
  * changed `events.ts` from Parquet TIMESTAMP(NANOS) (→ int64 ns under the
  * legacy flag) to TIMESTAMP(MICROS, NTZ) (→ TIMESTAMP_NTZ), and loaders
  * had baked in the physical encoding — 7 queries and 5 specs failed with
  * an analysis error nobody had named. This spec pins, per table, exactly
  * the (column, acceptable-types) contract the query surface relies on, so
  * the NEXT regeneration fails ONE named test with a readable diff.
  */
class FixtureSchemaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  /** column → the set of logical types the loaders/queries can absorb. */
  private def check(table: String, contract: (String, Set[DataType])*): Unit = {
    val schema = Tables.t(spark, dir, table).schema
    contract.foreach { case (name, ok) =>
      assert(schema.fieldNames.contains(name), s"$table: missing column $name")
      val dt = schema(name).dataType
      assert(ok.contains(dt),
        s"$table.$name resolved to $dt; queries support only ${ok.mkString("/")} — " +
          "fixture regeneration changed the encoding, update the loaders")
    }
  }

  private val ints: Set[DataType] = Set(IntegerType, LongType)
  private val temporal: Set[DataType] =
    Set(DateType, TimestampNTZType, TimestampType)

  test("events: ts encoding is one the probing loader handles") {
    // Tables.eventsWithTs branches on exactly these three; anything else
    // throws at load. LongType = legacy NANOS generation.
    check("events",
      "event_id" -> Set(LongType), "user_id" -> Set(LongType),
      "event_type" -> Set(StringType), "value" -> Set(DoubleType),
      "props" -> Set(StringType),
      "ts" -> Set(LongType, TimestampNTZType, TimestampType))
    // and the derived columns must actually materialize
    val df = Tables.eventsWithTs(spark, dir)
    assert(df.schema("ts_us").dataType == LongType)
    assert(df.schema("ts_micro").dataType == TimestampType)
    assert(df.limit(1).count() == 1)
  }

  test("tpch tables: key/measure/temporal types") {
    check("lineitem",
      "l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_returnflag" -> Set(StringType),
      "l_shipdate" -> temporal)
    check("orders",
      "o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_totalprice" -> Set(DoubleType), "o_orderdate" -> temporal,
      "o_orderstatus" -> Set(StringType))
    check("customer",
      "c_custkey" -> Set(LongType), "c_nationkey" -> ints,
      "c_acctbal" -> Set(DoubleType), "c_mktsegment" -> Set(StringType))
    check("supplier", "s_suppkey" -> Set(LongType), "s_nationkey" -> ints)
    check("part",
      "p_partkey" -> Set(LongType), "p_brand" -> Set(StringType),
      "p_size" -> ints, "p_retailprice" -> Set(DoubleType))
    check("nation", "n_nationkey" -> ints, "n_regionkey" -> ints,
      "n_name" -> Set(StringType))
    check("region", "r_regionkey" -> ints, "r_name" -> Set(StringType))
  }

  test("documents + embeddings: text and vector types") {
    check("documents",
      "doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> ints)
    val emb = Tables.t(spark, dir, "embeddings").schema
    assert(emb("vec_id").dataType == LongType)
    assert(emb("embedding").dataType.isInstanceOf[ArrayType], "embedding must be array")
    val elem = emb("embedding").dataType.asInstanceOf[ArrayType].elementType
    assert(Set[DataType](FloatType, DoubleType).contains(elem),
      s"embedding element resolved to $elem; vec functions support float/double")
  }

  test("documents.text is pure ASCII (multimodal_decode oracle contract)") {
    // the multimodal_decode oracle equates DuckDB ord(char) with the Java
    // payload byte, and multimodal_binary equates char length with byte
    // length — both true only for ASCII text. Pin it so a regeneration
    // with non-ASCII corpus text fails here, not in the oracle diff.
    import org.apache.spark.sql.functions._
    val nonAscii = Tables.t(spark, dir, "documents")
      .filter(length(col("text")) =!= octet_length(col("text"))).count()
    assert(nonAscii == 0,
      s"$nonAscii documents contain non-ASCII text; the multimodal oracles' " +
        "byte/char equivalences no longer hold — switch them to BLOB folds")
  }
}
