package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native mergeable aggregate:
  * one pass, `k-1` counters, O(k) state per partial — the streaming
  * summary (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS'12) that finds every item with frequency > N/k without
  * a full group-by.
  *
  * Guarantee (and why the query built on this is deterministic): after any
  * sequence of updates and merges over N items, every item with true count
  * > N/k is present in the candidate set, and each kept counter
  * underestimates its item's true count by at most N/k. The CANDIDATE SET
  * therefore depends on partition/merge order (it is a sketch), but
  * "candidates ⊇ true heavy items" always holds — so a query that
  * re-counts the candidates exactly and filters `count·k > N` produces
  * exactly the true heavy items, independent of plan order, and can be
  * hash-compared against a plain SQL oracle.
  *
  * Scale shape: partial sketches are built map-side (no shuffle of raw
  * items), merged as O(k) state through the normal partial-aggregation
  * tree, and the recount join touches only ≤ k-1 candidate keys. At
  * 100 TB that is the difference between shuffling every item once for a
  * full group-by and shuffling a few kilobytes of sketch state.
  */
case class MisraGriesSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 2, s"misra_gries needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string item column, got ${t.sql}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k - 1 => buf.update(item, 1L)
        case None =>
          // decrement-all step: every tracked count absorbs one of the
          // untracked item's weight; zeros free their counters
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keys.toArray.foreach { key =>
            val c = buf(key) - 1
            if (c <= 0) dead += key else buf.update(key, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    if (buf.size > k - 1) {
      // subtract the k-th largest count from everything (Mergeable
      // Summaries merge rule) — at most k-1 counters survive and the
      // total undercount stays bounded by N/k
      val d = buf.valuesIterator.toArray.sortBy(-_).apply(k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keys.toArray.foreach { key =>
        val c = buf(key) - d
        if (c <= 0) dead += key else buf.update(key, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_): Any))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) => out.writeUTF(item); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HeavyHitterFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "misra_gries", exprs => exprs match {
        case Seq(c) => MisraGriesSketch(c, 16)
        case Seq(c, kExpr) =>
          MisraGriesSketch(c, kExpr.eval().asInstanceOf[Number].intValue())
      }, "scala_udf")

  def misra_gries(item: Column, k: Int): Column =
    call_function("misra_gries", item, org.apache.spark.sql.functions.lit(k))
}
