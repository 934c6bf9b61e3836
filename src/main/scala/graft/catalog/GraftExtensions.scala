package graft.catalog

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import graft.table.GraftTable

/** Analyzer integration for graft catalog names.
  *
  * [[GraftCatalog.loadTable]] gives every `graft.<ns>.<table>` reference a
  * real DSv2 [[GraftSparkTable]]; writes (`df.writeTo(...).append()`,
  * `INSERT INTO`) flow through its SupportsWrite as vanilla Spark plans.
  * For READS this rule swaps the resolved relation for the snapshot's
  * self-contained SQL view ([[GraftTable.viewSql]] re-parsed), so scans
  * stay vectorized multi-path parquet reads with full filter/column
  * pushdown — strictly better than funnelling rows through the table's
  * V1Scan fallback. Iceberg wires its analyzer extensions the same way.
  *
  * ExprId stability: by the time this rule runs, parent operators may
  * already reference the relation's output attributes, so the substituted
  * plan must expose the SAME exprIds. The placeholder holds the original
  * output; once the parsed view subtree resolves, a projection aliases
  * the view's columns back onto the original attribute ids.
  *
  * Install at session build time:
  * {{{
  *   spark.sql.extensions = graft.catalog.GraftSparkSessionExtensions
  *   spark.sql.catalog.graft = graft.catalog.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /path/to/warehouse
  * }}}
  */
case class ResolveGraftTables(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Relations in WRITE position keep the DSv2 table: AppendData /
    // OverwriteByExpression plan against SupportsWrite, and row-level
    // commands must fail with Spark's own "not supported" guidance
    // (GraftSql is the engine's row-level SQL front).
    val writeTargets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => strip(c)
      case other => other
    }
    plan.foreach {
      case c: V2WriteCommand        => writeTargets.add(strip(c.table))
      case i: InsertIntoStatement   => writeTargets.add(strip(i.table))
      case d: DeleteFromTable       => writeTargets.add(strip(d.table))
      case u: UpdateTable           => writeTargets.add(strip(u.table))
      case m: MergeIntoTable        => writeTargets.add(strip(m.targetTable))
      case _ =>
    }
    // With V2 bucketing enabled, SPJ-shaped tables KEEP their DSv2
    // relation: the partition-reporting GraftBucketedScan is what makes
    // co-bucketed joins shuffle-free, and it matches the view path on
    // pushdown (same parquet reader function). Everything else still gets
    // the parquet-view swap. The snapshot is loaded ONCE per relation per
    // rule pass (the analyzer iterates to fixpoint; per-check loads would
    // multiply driver metadata I/O on object stores).
    val spjOn = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
      .contains("true")
    // An unresolved `_file`/`_pos` reference anywhere means Spark's
    // AddMetadataColumns still has to widen the relation output — swap
    // too early and the metadata column can never resolve. Defer one
    // fixpoint round; the post-widening swap synthesizes `_file` below.
    val pendingMetaRef = plan.exists(p => !p.resolved && p.expressions.exists(_.exists {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        u.nameParts.last.equalsIgnoreCase(GraftMetaCols.FILE) ||
          u.nameParts.last.equalsIgnoreCase(GraftMetaCols.POS)
      case _ => false
    }))
    // metadata-only aggregates: a bare, unfiltered COUNT(*) folds to the
    // snapshot log's dir row counts (captured by Observation during every
    // write), and MIN/MAX on a declared stats column folds from the
    // per-dir bounds sidecars (min of mins / max of maxes). Sound only
    // when every dir has the recorded stat and no equality deletes are
    // pending; anything else scans normally. At 100 TB this answers
    // `SELECT count(*), min(ts), max(ts)` without touching a file — the
    // role Iceberg's manifest stats play. TOP-DOWN and before the view
    // swap: bottom-up would replace the relation under the Aggregate.
    val counted = plan.resolveOperatorsDown {
      case agg @ Aggregate(Nil, aggExprs, child, _)
          if agg.resolved && aggExprs.nonEmpty &&
            aggExprs.forall(e => GraftCountFold.foldKind(e).isDefined) &&
            GraftCountFold.relationOf(child, writeTargets).isDefined =>
        GraftCountFold.relationOf(child, writeTargets).flatMap { gst =>
          val snap = gst.readSnapshot
          if (snap.deletes.nonEmpty) None
          else {
            val vals: Seq[Option[Any]] = aggExprs.map(e =>
              GraftCountFold.foldKind(e).get match {
                case GraftCountFold.CountStar =>
                  if (snap.dataDirs.forall(_.rowCount >= 0L))
                    Some(snap.dataDirs.map(_.rowCount).sum)
                  else None
                case GraftCountFold.MinMax(column, isMin) =>
                  gst.graftTable.globalBound(snap, column, isMin)
              })
            if (vals.forall(_.isDefined))
              Some(LocalRelation(agg.output.map(_.toAttribute),
                Seq(org.apache.spark.sql.catalyst.InternalRow(vals.map(_.get): _*))))
            else None
          }
        }.getOrElse(agg)
    }
    counted.resolveOperatorsUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftSparkTable] && !writeTargets.contains(r) &&
            !pendingMetaRef =>
        val gst = r.table.asInstanceOf[GraftSparkTable]
        val gt = gst.graftTable
        val snap = gst.asOfVersion.map { v =>
          val s = gt.snapshotAt(v)
          require(s.op != "expired", s"snapshot v$v has been expired; cannot time travel to it")
          s
        }.getOrElse(gt.snapshot)
        // metadata columns (`_file`) resolve against the relation's
        // metadataOutput without widening its output — a referenced one
        // means the relation must KEEP its DSv2 scan (the flat Batch scan
        // stamps real file paths and applies deletes reader-side; the
        // view's input_file_name would be illegal past its multi-source
        // union/anti-join shape)
        val usesMeta = r.metadataOutput.exists(m =>
          plan.exists(p => p.expressions.exists(_.exists {
            // resolved references only — an UnresolvedAttribute is an
            // Attribute too, and .exprId on it throws
            case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
              a.exprId == m.exprId
            case _ => false
          })))
        if (usesMeta || gst.keepScan) r
        else if (spjOn && gst.asOfVersion.isEmpty && GraftSparkTable.spjEligible(snap)) r
        // pending POSITION deletes key on the reader-stamped (_file, _pos)
        // identity — inexpressible as view SQL; keep the DSv2 scan, whose
        // delete-aware reader applies them
        else if (snap.deletes.exists(_.keys == graft.table.GraftTable.PosDeleteKeys)) r
        else GraftViewPlaceholder(r.output,
          spark.sessionState.sqlParser.parsePlan(gt.viewSqlOf(snap)))
      case h: GraftViewPlaceholder if h.child.resolved =>
        // rebind by NAME, not position: the view was rendered from the
        // CURRENT snapshot while h.output was resolved earlier in
        // analysis — under a concurrent schema change positional zip
        // would silently mislabel columns; a missing name fails loudly
        val byName = h.child.output.map(a => a.name.toLowerCase -> a).toMap
        val aliased: Seq[NamedExpression] = h.output.map { o =>
          byName.get(o.name.toLowerCase) match {
            case Some(c) =>
              val e = if (c.dataType == o.dataType) c else Cast(c, o.dataType)
              Alias(e, o.name)(exprId = o.exprId)
            case None if o.name == GraftMetaCols.FILE =>
              // `_file` metadata column on the view path: the file feeding
              // the row (exact for direct scans; empty past a shuffled
              // anti-join stage — large delete sets — a documented limit)
              Alias(org.apache.spark.sql.catalyst.expressions.InputFileName(), o.name)(
                exprId = o.exprId)
            case None =>
              throw new IllegalStateException(
                s"column ${o.name} disappeared from the table view during analysis " +
                  "(concurrent schema change); re-run the query")
          }
        }
        Project(aliased, h.child)
    }
  }
}

/** Pattern helpers for the metadata-only COUNT(*) fold. */
private[catalog] object GraftCountFold {
  import org.apache.spark.sql.catalyst.expressions.{Literal => CLit}
  import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}

  /** The graft table under a bare count: the relation itself or a
    * trivial column-pruning Project over it — a Filter (or anything
    * else) means the count depends on row data and must scan. */
  def relationOf(child: LogicalPlan,
                 writeTargets: java.util.Set[LogicalPlan]): Option[GraftSparkTable] =
    child match {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftSparkTable] && !writeTargets.contains(r) =>
        Some(r.table.asInstanceOf[GraftSparkTable])
      case Project(es, r) if es.forall(_.isInstanceOf[Attribute]) => relationOf(r, writeTargets)
      case SubqueryAlias(_, r) => relationOf(r, writeTargets)
      case _ => None
    }

  /** `count(*)` / `count(1)` (non-distinct, unfiltered), possibly aliased. */
  def isCountStar(e: NamedExpression): Boolean =
    foldKind(e).contains(CountStar)

  sealed trait FoldKind
  case object CountStar extends FoldKind
  /** `min(col)` / `max(col)` directly on a relation column. */
  final case class MinMax(column: String, isMin: Boolean) extends FoldKind

  /** The metadata-foldable shape of one aggregate output expression. */
  def foldKind(e: NamedExpression): Option[FoldKind] = e match {
    case Alias(ae, _) => foldKindExpr(ae)
    case other => foldKindExpr(other)
  }
  private def foldKindExpr(e: org.apache.spark.sql.catalyst.expressions.Expression): Option[FoldKind] =
    e match {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(CLit(_, _))) => Some(CountStar)
          case org.apache.spark.sql.catalyst.expressions.aggregate.Min(
            a: org.apache.spark.sql.catalyst.expressions.AttributeReference) =>
            Some(MinMax(a.name, isMin = true))
          case org.apache.spark.sql.catalyst.expressions.aggregate.Max(
            a: org.apache.spark.sql.catalyst.expressions.AttributeReference) =>
            Some(MinMax(a.name, isMin = false))
          case _ => None
        }
      case _ => None
    }
}

/** Holds a graft relation's original output attributes while the parsed
  * view subtree underneath resolves; [[ResolveGraftTables]] then projects
  * the resolved columns back onto those attribute ids. Never survives
  * analysis (`resolved` is false until replaced). */
case class GraftViewPlaceholder(output: Seq[Attribute], child: LogicalPlan)
    extends UnaryNode {
  override lazy val resolved: Boolean = false
  override protected def withNewChildInternal(newChild: LogicalPlan): GraftViewPlaceholder =
    copy(child = newChild)
}

class GraftSparkSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    extensions.injectResolutionRule(session => ResolveGraftTables(session))
}
