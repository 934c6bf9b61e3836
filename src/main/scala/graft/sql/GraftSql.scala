package graft.sql

import org.apache.spark.sql.{DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedIdentifier, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{StructField, StructType}
import graft.dml._
import graft.table.{GraftTable, PartitionField}

/** Text-SQL front for graft tables — entry point A of the reference
  * (`spark.sql("MERGE INTO …")`, `IcebergSQLMerge.java:46`;
  * `DELETE FROM`, `IcebergSQLDelete.java:32`; `INSERT INTO`,
  * `IcebergSQLMerge.java:23`).
  *
  * Spark's ANTLR parser already produces the row-level-command logical
  * nodes (`MergeIntoTable`, `DeleteFromTable`, `InsertIntoStatement`);
  * vanilla Spark then requires a DSv2 catalog with row-level-operation
  * support to execute them. GraftSql intercepts exactly those nodes for
  * tables registered in its catalog and executes them through the graft
  * planner + table layer; everything else (SELECT over registered views,
  * literal queries) falls through to plain `spark.sql`.
  *
  * Clause conversion goes through `Expression.sql` → `expr(...)`: the
  * parsed (unresolved) condition/assignment trees are re-rendered as SQL
  * and resolved inside MergePlanner's aliased join — no private analyzer
  * API needed.
  */
final class GraftSql(spark: SparkSession, defaultWarehouse: Option[String] = None) {
  private val tables = scala.collection.mutable.Map.empty[String, GraftTable]

  private lazy val warehouseDir: String = defaultWarehouse.getOrElse(
    java.nio.file.Files.createTempDirectory("graft_sql_wh").toString)

  /** Registers a graft table under a SQL name (also as a temp view so
    * SELECTs resolve; the view is refreshed after every DML). */
  def register(name: String, table: GraftTable): GraftSql = {
    tables(name.toLowerCase) = table
    refreshView(name)
    this
  }

  def table(name: String): GraftTable = tables(name.toLowerCase)

  private def refreshView(name: String): Unit =
    tables(name.toLowerCase).toDF.createOrReplaceTempView(name.replace(".", "__"))

  private def nameOf(plan: LogicalPlan): Option[String] = plan match {
    case u: UnresolvedRelation => Some(u.multipartIdentifier.mkString(".").toLowerCase)
    case SubqueryAlias(_, child) => nameOf(child)
    case _ => None
  }

  /** Auto-resolution through a configured GraftCatalog: DML against
    * `graft.<ns>.<table>` needs no register() call — the table loads from
    * the catalog's warehouse on first touch and is cached in the registry
    * (GraftTable handles are stateless; state lives in the log). */
  private def catalogLookup(name: String): Option[GraftTable] = {
    val parts = name.split('.')
    if (parts.length < 2) return None
    val confKey = s"spark.sql.catalog.${parts.head}"
    if (!spark.conf.getOption(confKey).contains(classOf[graft.catalog.GraftCatalog].getName))
      return None
    val wh = spark.conf.getOption(s"$confKey.warehouse").getOrElse(return None)
    val dir = parts.tail.mkString(s"$wh/", "/", "")
    if (!GraftTable.exists(spark, dir)) None
    else {
      val t = GraftTable.load(spark, dir)
      tables(name) = t
      refreshView(name)
      Some(t)
    }
  }

  /** Rewrites references to registered graft tables (possibly dotted,
    * `default.scd2_table`) into their backing temp-view names so a parsed
    * sub-plan (merge source, insert query) resolves through plain Spark.
    * Catalog-addressed names auto-register on first touch. */
  private def resolveRegistered(plan: LogicalPlan): LogicalPlan = plan.transform {
    case u: UnresolvedRelation
        if {
          val n = u.multipartIdentifier.mkString(".").toLowerCase
          tables.contains(n) || catalogLookup(n).isDefined
        } =>
      UnresolvedRelation(Seq(
        u.multipartIdentifier.mkString(".").toLowerCase.replace(".", "__")))
  }

  private def targetTable(plan: LogicalPlan): Option[GraftTable] =
    nameOf(plan).flatMap(n => tables.get(n).orElse(catalogLookup(n)))

  /** ALTER TABLE targets parse as UnresolvedTable, not UnresolvedRelation. */
  private def tableOfAlter(plan: LogicalPlan): Option[(String, GraftTable)] = plan match {
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
      val n = u.multipartIdentifier.mkString(".").toLowerCase
      tables.get(n).orElse(catalogLookup(n)).map(n -> _)
    case _ => None
  }

  /** Renders an unresolved parsed expression back to SQL and re-parses it
    * as a Column, rewriting the target/source qualifiers to the planner's
    * `t`/`s` aliases. */
  private def toCol(e: Expression, targetAlias: Option[String], sourceAlias: Option[String]) = {
    val rewritten = e.transform {
      case a: UnresolvedAttribute if a.nameParts.length > 1 =>
        val q = a.nameParts.head.toLowerCase
        if (targetAlias.contains(q)) UnresolvedAttribute("t" +: a.nameParts.tail)
        else if (sourceAlias.contains(q)) UnresolvedAttribute("s" +: a.nameParts.tail)
        else a
    }
    expr(rewritten.sql)
  }

  private def aliasOf(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(id, _) => Some(id.name.toLowerCase)
    case _ => None
  }

  /** Strips the table qualifier off attribute references in a single-table
    * DML condition so they resolve against the UNALIASED toDF frame.
    * Accepts the explicit alias, the full registered name (`db.t.col`),
    * or its last segment (`t.col` against a table registered as `db.t`). */
  private def stripQualifier(e: Expression, registered: String,
                             alias: Option[String]): Expression = {
    val nameLc = registered.toLowerCase.split('.').toSeq
    e.transform {
      case a: UnresolvedAttribute if a.nameParts.length > 1 =>
        val lc = a.nameParts.map(_.toLowerCase)
        val stripped =
          if (alias.contains(lc.head)) a.nameParts.tail
          else if (lc.length > nameLc.length && lc.startsWith(nameLc))
            a.nameParts.drop(nameLc.length)
          else if (lc.head == nameLc.last) a.nameParts.tail
          else a.nameParts
        if (stripped eq a.nameParts) a else UnresolvedAttribute(stripped)
    }
  }

  /** Executes a SQL statement. DML over registered graft tables runs
    * through the graft planner; other statements run via `spark.sql`
    * (registered tables are visible to SELECTs as `<name with . as __>`
    * temp views). Returns the post-state for DML, the result otherwise. */
  /** Where a CREATE TABLE lands: a configured GraftCatalog's warehouse
    * for `graft.ns.t` names, this GraftSql's default warehouse otherwise
    * (dots become directory levels, like the reference's hadoop catalog). */
  private def createDirFor(parts: Seq[String]): String = {
    val confKey = s"spark.sql.catalog.${parts.head}"
    if (parts.length >= 2 &&
        spark.conf.getOption(confKey).contains(classOf[graft.catalog.GraftCatalog].getName))
      parts.tail.mkString(spark.conf.get(s"$confKey.warehouse") + "/", "/", "")
    else parts.mkString(s"$warehouseDir/", "/", "")
  }

  private def runCreate(nameParts: Seq[String], schema: StructType,
                        partitioning: Seq[Transform], ignoreIfExists: Boolean,
                        data: Option[DataFrame]): DataFrame = {
    val name = nameParts.mkString(".").toLowerCase
    val dir = createDirFor(nameParts)
    val existed = GraftTable.exists(spark, dir)
    if (existed) {
      if (!ignoreIfExists) throw new IllegalStateException(s"table $name already exists")
    } else {
      GraftTable.create(spark, dir, schema, spec = partitioning.map(PartitionField.fromTransform))
    }
    register(name, GraftTable.load(spark, dir))
    // CTAS data loads only into a table THIS statement created: re-running
    // `CREATE TABLE IF NOT EXISTS ... AS SELECT` must leave an existing
    // table untouched (SQL semantics), not append a duplicate copy
    if (!existed) data.foreach(df => { tables(name).append(df); refreshView(name) })
    tables(name).toDF
  }

  // Iceberg's spec-evolution extension grammar — not in Spark's parser,
  // so these statements are intercepted BEFORE parsePlan:
  //   ALTER TABLE t ADD PARTITION FIELD month(c)
  //   ALTER TABLE t DROP PARTITION FIELD month(c)
  //   ALTER TABLE t REPLACE PARTITION FIELD month(c) WITH bucket(8, k)
  private val replaceSpecRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+REPLACE\s+PARTITION\s+FIELD\s+(.+?)\s+WITH\s+(.+?)\s*$""".r
  private val addDropSpecRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+(ADD|DROP)\s+PARTITION\s+FIELD\s+(.+?)\s*$""".r
  //   ALTER TABLE t WRITE ORDERED BY (a, b)  — sort-order evolution
  //   ALTER TABLE t WRITE UNORDERED
  private val writeOrderRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+WRITE\s+ORDERED\s+BY\s*\(?\s*([\w,`\s]+?)\s*\)?\s*$""".r
  private val writeUnorderedRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+WRITE\s+UNORDERED\s*$""".r
  //   CREATE MATERIALIZED VIEW mv AS SELECT g…, count(*), sum(v) FROM base GROUP BY g…
  //   REFRESH MATERIALIZED VIEW mv
  // — the SQL front of the incremental-MV loop (create = MV table + seed
  // + registration; refresh = changelog fold via the epoch ledger). Not
  // in Spark's grammar, so intercepted before parsePlan.
  private val createMvRe =
    """(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+([\w.`]+)\s+AS\s+(SELECT\s.+)$""".r
  private val refreshMvRe =
    """(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.`]+)\s*$""".r
  private val dropMvRe =
    """(?is)^\s*DROP\s+MATERIALIZED\s+VIEW\s+([\w.`]+)\s*$""".r

  /** CREATE MATERIALIZED VIEW: the defining SELECT must be a plain
    * `GROUP BY` aggregate over ONE registered graft table whose outputs
    * are the grouping columns plus any of count(*) / count(v) / sum(v)
    * for a single value column v (aliases are accepted and ignored — the
    * MV stores the canonical (g…, n, nn, total) columns the fold and the
    * transparent rewrite operate on). Creates the keyed MV table, seeds
    * it from the base's pinned current snapshot with fold-identical
    * arithmetic, stamps the version it reflects, writes self-describing
    * refresh properties, and registers the MV on the base so the
    * analyzer rewrite can serve it. */
  private def runCreateMv(rawName: String, selectText: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val mvName = rawName.replace("`", "").toLowerCase
    val parsed = spark.sessionState.sqlParser.parsePlan(selectText)
    val baseNames = parsed.collect {
      case u: UnresolvedRelation => u.multipartIdentifier.mkString(".").toLowerCase
    }.distinct
    require(baseNames.size == 1,
      s"materialized view must select from exactly one table, got $baseNames")
    val (baseName, baseT) = namedTable(baseNames.head)
    // analyze the defining SELECT through the registered views, then
    // classify its RESOLVED aggregate — same taxonomy as the serving rule
    val df = GraftShim.ofRows(spark, resolveRegistered(parsed))
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
    import org.apache.spark.sql.catalyst.expressions.{Literal => CLit}
    val agg = df.queryExecution.analyzed.collectFirst { case a: Aggregate => a }
      .getOrElse(throw new IllegalArgumentException(
        "materialized view definition must be a GROUP BY aggregate"))
    val gAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case e => throw new IllegalArgumentException(
        s"materialized view can only group by plain columns, got ${e.sql}")
    }
    require(gAttrs.nonEmpty, "materialized view needs at least one grouping column")
    var valueCol: Option[String] = None
    def noteValue(c: String): Unit = {
      require(valueCol.forall(_ == c),
        s"materialized view aggregates must share one value column, got $valueCol and $c")
      valueCol = Some(c)
    }
    agg.aggregateExpressions.foreach { ne =>
      val e = ne match { case Alias(c, _) => c; case other => other }
      e match {
        case a: AttributeReference if gAttrs.exists(_.exprId == a.exprId) => ()
        case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case Count(Seq(CLit(_, _))) => ()
            case Count(Seq(a: AttributeReference)) => noteValue(a.name)
            case Sum(a: AttributeReference, _) => noteValue(a.name)
            case f => throw new IllegalArgumentException(
              s"unsupported aggregate in materialized view: ${f.sql}")
          }
        case other => throw new IllegalArgumentException(
          s"unsupported select item in materialized view: ${other.sql}")
      }
    }
    val v = valueCol.getOrElse(throw new IllegalArgumentException(
      "materialized view needs sum(<value>) or count(<value>) to fix the value column"))
    val groupCols = gAttrs.map(_.name)
    val dec = DecimalType(28, 2)
    val mvDir = createDirFor(mvName.split('.').toSeq)
    require(!GraftTable.exists(spark, mvDir), s"table $mvName already exists")
    // pin ONE base snapshot: seed content and stamp must describe the
    // same version even under concurrent base commits
    val s0 = baseT.snapshot
    val seed = baseT.dfAt(s0).groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).cast(LongType).as("n"),
      count(col(v)).cast(LongType).as("nn"),
      // fold-identical arithmetic: an all-NULL group stores 0 (nn=0 keeps
      // SQL's NULL on the serving side), so seeded and folded MVs are
      // byte-identical for the same content
      coalesce(sum(col(v)), lit(BigDecimal(0))).cast(dec).as("total"))
    val mvT = GraftTable.create(spark, mvDir, seed.schema,
      key = groupCols, formatVersion = 2)
    mvT.append(seed)
    mvT.setProperties(Map(
      GraftTable.MvBaseVersionProp -> s0.version.toString,
      GraftTable.MvBaseDirProp -> baseT.dir,
      GraftTable.MvGroupColsProp -> groupCols.mkString(","),
      GraftTable.MvValueColProp -> v))
    baseT.registerMv(mvName.split('.').last, mvDir, groupCols, v)
    refreshView(baseName) // registration bumped the base version
    register(mvName, GraftTable.load(spark, mvDir))
    tables(mvName).toDF
  }

  /** REFRESH MATERIALIZED VIEW — delegates to the shared core
    * ([[graft.streaming.StreamOps.refreshMv]]; `CALL
    * graft.system.refresh_mv` is the scheduler-facing twin). */
  private def runRefreshMv(rawName: String): DataFrame = {
    val (mvName, mvT) = namedTable(rawName)
    graft.streaming.StreamOps.refreshMv(spark, mvT)
    refreshView(mvName)
    GraftTable.load(spark, mvT.dir).toDF
  }

  /** DROP MATERIALIZED VIEW: removes the base-table registration FIRST
    * (a query racing the drop either still serves the intact MV or has
    * already fallen back to the scan — never reads half-deleted files;
    * the rewrite also tolerates a vanished MV dir by declining), then
    * deletes the MV table's storage and local registrations. */
  private def runDropMv(rawName: String): DataFrame = {
    val (mvName, mvT) = namedTable(rawName)
    val baseDir = mvT.properties.getOrElse(GraftTable.MvBaseDirProp,
      throw new IllegalArgumentException(s"$mvName is not a materialized view " +
        s"(no ${GraftTable.MvBaseDirProp} property)"))
    val baseT = GraftTable.load(spark, baseDir)
    val regs = baseT.properties.collect {
      case (k, v) if k.startsWith(GraftTable.MvRegistrationPrefix) &&
        k != GraftTable.MvBaseVersionProp && v.contains(s"dir=${mvT.dir};") => k
    }.toSeq
    if (regs.nonEmpty)
      baseT.setProperties(regs.map(_ -> (null: String)).toMap)
    val p = new org.apache.hadoop.fs.Path(mvT.dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    tables.remove(mvName)
    spark.catalog.dropTempView(mvName.replace(".", "__"))
    spark.emptyDataFrame
  }

  private def namedTable(rawName: String): (String, GraftTable) = {
    val name = rawName.replace("`", "").toLowerCase
    name -> tables.get(name).orElse(catalogLookup(name))
      .getOrElse(throw new IllegalArgumentException(s"unknown graft table: $name"))
  }

  private def alterSpec(rawName: String)(change: Seq[PartitionField] => Seq[PartitionField]): DataFrame = {
    val (name, t) = namedTable(rawName)
    t.updateSpec(change(t.spec))
    refreshView(name)
    t.toDF
  }

  def sql(text: String): DataFrame = {
    text match {
      case replaceSpecRe(name, oldF, newF) =>
        val (o, n) = (PartitionField.parse(oldF), PartitionField.parse(newF))
        return alterSpec(name) { spec =>
          require(spec.contains(o), s"no such partition field: $oldF")
          spec.map(pf => if (pf == o) n else pf)
        }
      case addDropSpecRe(name, action, fieldS) =>
        val f = PartitionField.parse(fieldS)
        return alterSpec(name) { spec =>
          if (action.equalsIgnoreCase("ADD")) {
            require(!spec.contains(f), s"partition field already present: $fieldS")
            spec :+ f
          } else {
            require(spec.contains(f), s"no such partition field: $fieldS")
            spec.filterNot(_ == f)
          }
        }
      case writeOrderRe(name, cols) =>
        val (n, t) = namedTable(name)
        t.replaceSortKey(cols.split(',').map(_.trim.replace("`", "")).filter(_.nonEmpty).toSeq)
        refreshView(n)
        return t.toDF
      case writeUnorderedRe(name) =>
        val (n, t) = namedTable(name)
        t.replaceSortKey(Seq.empty)
        refreshView(n)
        return t.toDF
      case createMvRe(name, select) => return runCreateMv(name, select)
      case refreshMvRe(name) => return runRefreshMv(name)
      case dropMvRe(name) => return runDropMv(name)
      case _ =>
    }
    val parsed = spark.sessionState.sqlParser.parsePlan(text)
    parsed match {
      // ANALYZE TABLE t COMPUTE STATISTICS → the sidecar backfill
      // ([[graft.table.GraftTable.captureStats]]); `CALL
      // graft.system.capture_stats` is the procedure-facing twin
      case a: org.apache.spark.sql.catalyst.plans.logical.AnalyzeTable =>
        val name = a.child match {
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
            u.multipartIdentifier.mkString(".").toLowerCase
          case other => throw new IllegalArgumentException(
            s"unsupported ANALYZE target: $other")
        }
        val t = tables.get(name).orElse(catalogLookup(name)).getOrElse(
          throw new IllegalArgumentException(s"no such table: $name"))
        t.captureStats()
        t.toDF
      case c: CreateTable =>
        val parts = c.name.asInstanceOf[UnresolvedIdentifier].nameParts
        val schema = StructType(c.columns.map { cd =>
          val f = StructField(cd.name, cd.dataType, cd.nullable)
          // column comments round-trip through StructField metadata →
          // StructType.json in the log (reference: `customer_id bigint
          // COMMENT 'unique id'`, IcebergSQLMerge.java:18)
          cd.comment.map(f.withComment).getOrElse(f)
        })
        runCreate(parts, schema, c.partitioning, c.ignoreIfExists, None)
      case c: CreateTableAsSelect =>
        val parts = c.name.asInstanceOf[UnresolvedIdentifier].nameParts
        val df = GraftShim.ofRows(spark, resolveRegistered(c.query))
        runCreate(parts, df.schema, c.partitioning, c.ignoreIfExists, Some(df))
      case a: AddColumns if tableOfAlter(a.table).isDefined =>
        val (name, t) = tableOfAlter(a.table).get
        a.columnsToAdd.foreach(c => t.addColumn(c.name.last, c.dataType))
        refreshView(name)
        t.toDF
      case d: DropColumns if tableOfAlter(d.table).isDefined =>
        val (name, t) = tableOfAlter(d.table).get
        d.columnsToDrop.foreach { f =>
          val fieldName = f.asInstanceOf[org.apache.spark.sql.catalyst.analysis.UnresolvedFieldName]
            .name.last
          t.dropColumn(fieldName)
        }
        refreshView(name)
        t.toDF
      case p: org.apache.spark.sql.catalyst.plans.logical.SetTableProperties
          if tableOfAlter(p.table).isDefined =>
        val (name, t) = tableOfAlter(p.table).get
        def cols(v: String) = v.split(',').map(_.trim).filter(_.nonEmpty).toSeq
        p.properties.foreach {
          // declarative skipping metadata: which columns get bloom /
          // [min,max] sidecars on future writes
          case ("graft.bloom-keys", v) => t.setBloomKeys(cols(v))
          case ("graft.stats-keys", v) => t.setStatsKeys(cols(v))
          // everything else: free-form snapshot-log property (round 14)
          case (k, v) => t.setProperties(Map(k -> v))
        }
        refreshView(name)
        t.toDF
      case p: org.apache.spark.sql.catalyst.plans.logical.UnsetTableProperties
          if tableOfAlter(p.table).isDefined =>
        val (name, t) = tableOfAlter(p.table).get
        require(!p.propertyKeys.exists(k => k == "graft.bloom-keys" || k == "graft.stats-keys"),
          "unset the skipping metadata by setting an empty column list instead")
        t.setProperties(p.propertyKeys.map(_ -> (null: String)).toMap)
        refreshView(name)
        t.toDF
      case r: org.apache.spark.sql.catalyst.plans.logical.RenameColumn
          if tableOfAlter(r.table).isDefined =>
        val (name, t) = tableOfAlter(r.table).get
        t.renameColumn(r.column.asInstanceOf[
          org.apache.spark.sql.catalyst.analysis.UnresolvedFieldName].name.last, r.newName)
        refreshView(name)
        t.toDF
      case m: MergeIntoTable if targetTable(m.targetTable).isDefined =>
        runMerge(m)
      case d: DeleteFromTable if targetTable(d.table).isDefined =>
        val name = nameOf(d.table).get
        val t = tables(name)
        // strip the alias/table qualifier (same rewrite as UPDATE below):
        // the condition filters the UNALIASED toDF frame inside
        // MergePlanner.delete, where `c.customer_id` can never resolve
        val alias = aliasOf(d.table)
        def bare(e: Expression) = expr(stripQualifier(e, name, alias).sql)
        t.delete(bare(d.condition))
        refreshView(name)
        t.toDF
      case u: UpdateTable if targetTable(u.table).isDefined =>
        val name = nameOf(u.table).get
        val t = tables(name)
        val alias = aliasOf(u.table)
        // UPDATE set-expressions/condition reference unqualified columns
        // after alias rewrite (single-table statement)
        def bare(e: Expression) = expr(stripQualifier(e, name, alias).sql)
        val set = u.assignments.map(a =>
          a.key.asInstanceOf[UnresolvedAttribute].nameParts.last -> bare(a.value)).toMap
        t.update(set, u.condition.map(bare).getOrElse(
          org.apache.spark.sql.functions.lit(true)))
        refreshView(name)
        t.toDF
      case i: InsertIntoStatement
          if nameOf(i.table).exists(n => tables.contains(n) || catalogLookup(n).isDefined) =>
        val name = nameOf(i.table).get
        val t = tables(name)
        val df = GraftShim.ofRows(spark, resolveRegistered(i.query))
        // positional column mapping with implicit casts (reference X2):
        // into the user-specified column list when present, else into the
        // table schema's leading columns
        val targets =
          if (i.userSpecifiedCols.nonEmpty) i.userSpecifiedCols
          else t.schema.fieldNames.take(df.columns.length).toSeq
        require(targets.length == df.columns.length,
          s"INSERT column count mismatch: ${targets.length} target columns, " +
            s"${df.columns.length} query columns")
        val aligned = df.toDF(targets: _*)
        if (i.overwrite) t.overwrite(aligned) else t.append(aligned)
        refreshView(name)
        t.toDF
      case _ => spark.sql(text) // SELECT / DDL passthrough
    }
  }

  private def runMerge(m: MergeIntoTable): DataFrame = {
    val name = nameOf(m.targetTable).get
    val t = tables(name)
    val tAlias = aliasOf(m.targetTable).orElse(Some(name))
    val sAlias = aliasOf(m.sourceTable)
    val source = GraftShim.ofRows(spark, resolveRegistered(m.sourceTable match {
      case SubqueryAlias(_, child) => child
      case other => other
    }))

    // ON condition must be an equi-conjunction between the two sides;
    // sides are told apart by alias qualifier (general `ON s.id = t.cid`),
    // falling back to same-name equality for unqualified conjuncts
    def side(a: UnresolvedAttribute): Option[String] =
      if (a.nameParts.length <= 1) None
      else {
        val q = a.nameParts.head.toLowerCase
        if (tAlias.contains(q)) Some("t")
        else if (sAlias.contains(q)) Some("s")
        else None
      }
    def keysOf(e: Expression): Seq[(String, String)] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) => keysOf(l) ++ keysOf(r)
      case org.apache.spark.sql.catalyst.expressions.EqualTo(
          a: UnresolvedAttribute, b: UnresolvedAttribute) =>
        val an = a.nameParts.last; val bn = b.nameParts.last
        (side(a), side(b)) match {
          case (Some("t"), Some("s")) => Seq((an, bn))
          case (Some("s"), Some("t")) => Seq((bn, an))
          case _ =>
            require(an.equalsIgnoreCase(bn),
              s"MERGE ON with differently-named keys needs alias-qualified sides, " +
                s"got ${a.sql} = ${b.sql}")
            Seq((an, bn))
        }
      case other => throw new IllegalArgumentException(
        s"MERGE ON supports conjunctions of key equalities, got ${other.sql}")
    }
    val keyPairs = keysOf(m.mergeCondition)

    def assignments(as: Seq[Assignment]): Map[String, org.apache.spark.sql.Column] =
      as.map(a => a.key.asInstanceOf[UnresolvedAttribute].nameParts.last ->
        toCol(a.value, tAlias, sAlias)).toMap

    val matched: Seq[MergeClause] = m.matchedActions.map {
      case UpdateAction(cond, as, _) =>
        UpdateClause(assignments(as), cond.map(toCol(_, tAlias, sAlias)))
      case UpdateStarAction(cond) => UpdateAllClause(cond.map(toCol(_, tAlias, sAlias)))
      case DeleteAction(cond) => DeleteClause(cond.map(toCol(_, tAlias, sAlias)))
      case other => throw new IllegalArgumentException(s"unsupported matched action: $other")
    }
    val notMatched: Seq[MergeClause] = m.notMatchedActions.map {
      case InsertAction(cond, as) =>
        InsertClause(assignments(as), cond.map(toCol(_, tAlias, sAlias)))
      case InsertStarAction(cond) => InsertAllClause(cond.map(toCol(_, tAlias, sAlias)))
      case other => throw new IllegalArgumentException(s"unsupported not-matched action: $other")
    }
    val notMatchedBySource: Seq[MergeClause] = m.notMatchedBySourceActions.map {
      case UpdateAction(cond, as, _) =>
        UpdateClause(assignments(as), cond.map(toCol(_, tAlias, sAlias)))
      case DeleteAction(cond) => DeleteClause(cond.map(toCol(_, tAlias, sAlias)))
      case other => throw new IllegalArgumentException(
        s"unsupported not-matched-by-source action: $other")
    }

    t.mergeOn(source, keyPairs, matched, notMatched, notMatchedBySource)
    refreshView(name)
    t.toDF
  }
}

object GraftSql {
  def apply(spark: SparkSession): GraftSql = new GraftSql(spark)
}
