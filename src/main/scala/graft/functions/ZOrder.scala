package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of two long columns: bit i of each input
  * lands at output bits 2i / 2i+1, so sorting by the result clusters
  * rows that are close in BOTH dimensions — the write-layout trick that
  * lets one sorted file layout serve range predicates on either column
  * (Delta/Iceberg OPTIMIZE ZORDER BY). Use the low 32 bits of each input
  * (callers pre-bucket wider domains, e.g. `xxhash64(c) & 0xFFFFFFFF` or
  * epoch-minutes): `t.replaceSortKey` on a materialized z column, or
  * `sortWithinPartitions(z_order(a, b))` before a write.
  */
case class ZOrderLong(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"z_order requires (bigint, bigint), got (${l.sql}, ${r.sql})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "z_order"

  override def nullSafeEval(a: Any, b: Any): Any = {
    java.lang.Long.valueOf(ZOrderLong.interleave(
      a.asInstanceOf[Long], b.asInstanceOf[Long]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderLong.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderLong {
  /** Interleaves the low 32 bits of a (even positions) and b (odd). */
  def interleave(a: Long, b: Long): Long =
    spread(a & 0xFFFFFFFFL) | (spread(b & 0xFFFFFFFFL) << 1)

  /** Spreads the low 32 bits of v to the even bit positions of a long
    * (standard Morton magic-number spread). */
  def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8))  & 0x00FF00FF00FF00FFL
    v = (v | (v << 4))  & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2))  & 0x3333333333333333L
    v = (v | (v << 1))  & 0x5555555555555555L
    v
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_order", exprs => ZOrderLong(exprs(0), exprs(1)), "scala_udf")

  def z_order(a: Column, b: Column): Column = call_function("z_order", a, b)
}
