package graft.catalog

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import graft.table.GraftTable

/** Analyzer integration for graft catalog names. Spark 4.1 ships the
  * DSv2 `ViewCatalog` SPI but its analyzer never calls `loadView` — view
  * resolution is left to engine extensions (Iceberg wires its own rules
  * the same way). This resolution rule expands
  * `UnresolvedRelation([<graft catalog>, ns…, table])` into the table's
  * snapshot view plan ([[GraftTable.viewSql]] parsed back through
  * Spark's parser); the surrounding fixed-point analysis then resolves
  * the inner `parquet.`path`` relations normally, keeping vectorized
  * scans + pushdown.
  *
  * Install at session build time:
  * {{{
  *   spark.sql.extensions = graft.catalog.GraftSparkSessionExtensions
  *   spark.sql.catalog.graft = graft.catalog.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /path/to/warehouse
  * }}}
  */
case class ResolveGraftTables(spark: SparkSession) extends Rule[LogicalPlan] {

  private def isGraftCatalog(name: String): Boolean =
    spark.conf.getOption(s"spark.sql.catalog.$name")
      .contains(classOf[GraftCatalog].getName)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation if u.multipartIdentifier.length >= 2
        && isGraftCatalog(u.multipartIdentifier.head) =>
      val parts = u.multipartIdentifier
      val wh = spark.conf.get(s"spark.sql.catalog.${parts.head}.warehouse")
      val dir = parts.tail.mkString(s"$wh/", "/", "")
      if (GraftTable.exists(spark, dir)) {
        val t = GraftTable.load(spark, dir)
        SubqueryAlias(parts.last, spark.sessionState.sqlParser.parsePlan(t.viewSql))
      } else u // fall through to the normal "not found" error
  }
}

class GraftSparkSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    extensions.injectResolutionRule(session => ResolveGraftTables(session))
}
