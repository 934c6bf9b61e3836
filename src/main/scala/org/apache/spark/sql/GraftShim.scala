package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal accessor into `private[sql]` Spark API: builds a DataFrame
  * from a LogicalPlan (used by graft.sql.GraftSql to execute the query
  * part of parsed INSERT/MERGE statements). Standard extension-library
  * technique — `private[sql]` members are public in bytecode and this
  * object lives in the sql package to access them directly. */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ↔ catalyst Expression bridges (Spark 4 removed Column.expr). */
  def expression(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Neutral view of a Column's (private[sql]) ColumnNode tree, for
    * predicate analysis outside the sql package (transform pruning). */
  sealed trait Node
  final case class FnNode(name: String, args: Seq[Node]) extends Node
  final case class AttrNode(name: String) extends Node
  final case class LitNode(value: Any) extends Node
  case object OtherNode extends Node

  def toNode(c: Column): Node = conv(c.node)
  private def conv(n: internal.ColumnNode): Node = n match {
    case f: internal.UnresolvedFunction => FnNode(f.functionName, f.arguments.map(conv))
    case a: internal.UnresolvedAttribute => AttrNode(a.nameParts.last)
    case l: internal.Literal => LitNode(l.value)
    case _ => OtherNode
  }
}
