package graft.dml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE clause ADT, covering the reference's full surface:
  * explicit UPDATE/INSERT column lists (`IcebergSQLMerge.java:29-46`),
  * star clauses `UPDATE SET *` / `INSERT *` with name-based alignment
  * (`IcebergSQLMerge.java:50-92`), extra MATCHED-clause predicates (the
  * CDC late-data guard, `IcebergSQLMergeAsDeleteInsert.java:40-46`), and
  * WHEN MATCHED DELETE.
  *
  * Conditions and set-expressions reference the two sides as `t.<col>` and
  * `s.<col>` (the planner aliases target/source accordingly).
  */
sealed trait MergeClause { def cond: Option[Column] }
final case class UpdateClause(set: Map[String, Column], cond: Option[Column] = None) extends MergeClause
final case class UpdateAllClause(cond: Option[Column] = None) extends MergeClause
final case class DeleteClause(cond: Option[Column] = None) extends MergeClause
final case class InsertClause(values: Map[String, Column], cond: Option[Column] = None) extends MergeClause
final case class InsertAllClause(cond: Option[Column] = None) extends MergeClause

/** Spark-first MERGE: one full-outer join on the key columns + per-row
  * clause resolution, exactly the plan Iceberg's extension rules rewrite
  * SQL MERGE into (SURVEY.md §3 step 3) — but declared directly with the
  * DataFrame API so Catalyst optimizes the whole thing (join strategy
  * selection, pushdown through the join, AQE skew handling) with zero
  * custom rules.
  *
  * Scale: the join shuffles both sides by the key unless the source is
  * broadcastable (Catalyst decides); no collect, no driver state. The
  * cardinality check is the SQL-standard "nondeterministic merge" error
  * (Iceberg raises it too): any target row matching >1 source rows fails.
  */
object MergePlanner {

  /** Star alignment by name (M3): `UPDATE SET *` sets every target column
    * that the source also has; source columns missing from the target are
    * ignored (pre-evolution `IcebergSQLMerge.java:50-66` runs a source
    * with an extra `email` column against a 3-column target without
    * error; after `ADD COLUMN email` the same merge picks it up).
    * `INSERT *` inserts target columns from same-named source columns,
    * NULL where the source lacks the column (`IcebergSQLMerge.java:74-92`
    * merges a source without `lastname`). */
  private def expandStar(clause: MergeClause, targetCols: Seq[String],
                         sourceCols: Seq[String]): MergeClause = clause match {
    case UpdateAllClause(c) =>
      UpdateClause(targetCols.filter(sourceCols.contains)
        .map(n => n -> col(s"s.$n")).toMap, c)
    case InsertAllClause(c) =>
      InsertClause(targetCols.filter(sourceCols.contains)
        .map(n => n -> col(s"s.$n")).toMap, c)
    case other => other
  }

  /** Pure DataFrame-in/DataFrame-out merge. Output schema = target schema.
    *
    * @param notMatchedBySource clauses applied to TARGET rows with no
    *   source match (`WHEN NOT MATCHED BY SOURCE THEN UPDATE/DELETE`,
    *   SQL:2023 / Spark 3.4+ MERGE surface) — update expressions here may
    *   reference only the target side.
    * @param validateCardinality when true, eagerly errors if any target
    *   row matches more than one source row (Iceberg/SQL-standard rule —
    *   SURVEY.md §7.4). Costs one extra aggregation over the source keys.
    */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
            matched: Seq[MergeClause], notMatched: Seq[MergeClause],
            notMatchedBySource: Seq[MergeClause] = Seq.empty,
            validateCardinality: Boolean = true): DataFrame =
    mergeOn(target, source, keys.map(k => (k, k)), matched, notMatched,
      notMatchedBySource, validateCardinality)

  /** General-ON form: each key pair is (target column, source column) —
    * `ON t.customer_id = s.id` style conditions where the two sides name
    * the key differently. Star clauses still align by NAME (SQL `SET *`
    * semantics), so a differently-named key is never star-assigned. */
  def mergeOn(target: DataFrame, source: DataFrame, keyPairs: Seq[(String, String)],
              matched: Seq[MergeClause], notMatched: Seq[MergeClause],
              notMatchedBySource: Seq[MergeClause] = Seq.empty,
              validateCardinality: Boolean = true): DataFrame = {
    val targetCols = target.columns.toSeq
    val sourceCols = source.columns.toSeq
    require(keyPairs.nonEmpty, "merge requires at least one key column")
    val srcKeys = keyPairs.map(_._2)

    if (validateCardinality) {
      // duplicate source keys can only break rows that exist in the target:
      // check duplicates among source keys that hit the target (semi-join
      // keeps this cheap and fully distributed)
      val dup = source.groupBy(srcKeys.map(col): _*).count().filter(col("count") > 1)
        .join(target.select(keyPairs.map { case (tk, sk) => col(tk).as(sk) }: _*).distinct(),
          srcKeys, "left_semi")
        .limit(1).count()
      if (dup > 0) throw new IllegalStateException(
        "MERGE: a target row matches more than one source row (ON clause is not unique)")
    }

    val t = target.withColumn("__t_exists", lit(true)).alias("t")
    val s = source.withColumn("__s_exists", lit(true)).alias("s")
    // plain equality (not null-safe): NULL keys never match, same as SQL
    // MERGE ON and the DuckDB oracle's FULL OUTER JOIN
    val joinCond = keyPairs.map { case (tk, sk) => col(s"t.$tk") === col(s"s.$sk") }
      .reduce(_ && _)
    val j = t.join(s, joinCond, "full_outer")

    val isMatched = col("t.__t_exists").isNotNull && col("s.__s_exists").isNotNull
    val sourceOnly = col("t.__t_exists").isNull

    val m = matched.map(expandStar(_, targetCols, sourceCols))
    val nm = notMatched.map(expandStar(_, targetCols, sourceCols))
    val nmbs = notMatchedBySource
    require(m.forall(c => c.isInstanceOf[UpdateClause] || c.isInstanceOf[DeleteClause]),
      "WHEN MATCHED supports UPDATE/DELETE only")
    require(nm.forall(_.isInstanceOf[InsertClause]), "WHEN NOT MATCHED supports INSERT only")
    require(nmbs.forall(c => c.isInstanceOf[UpdateClause] || c.isInstanceOf[DeleteClause]),
      "WHEN NOT MATCHED BY SOURCE supports UPDATE/DELETE only")

    // resolve which clause fires per row: first clause whose condition holds
    def actionOf(clauses: Seq[MergeClause], offset: Int): Column =
      clauses.zipWithIndex.foldRight(lit(-1)) { case ((cl, i), els) =>
        when(cl.cond.getOrElse(lit(true)), lit(offset + i)).otherwise(els)
      }
    val action =
      when(isMatched, actionOf(m, 0))
        .when(sourceOnly, actionOf(nm, 100))
        .otherwise(actionOf(nmbs, 200)) // target-only; -1 falls through to keep
    val withAction = j.withColumn("__action", action)

    // delete rows where a DELETE clause fired; drop source-only rows with
    // no INSERT clause fired; everything else projects per-clause values
    val deleteIdx = m.zipWithIndex.collect { case (_: DeleteClause, i) => i } ++
      nmbs.zipWithIndex.collect { case (_: DeleteClause, i) => 200 + i }
    val kept0 =
      if (deleteIdx.isEmpty) withAction
      else withAction.filter(!col("__action").isin(deleteIdx.map(_.asInstanceOf[Any]): _*))
    val kept = kept0.filter(!(col("__action") === -1 && sourceOnly))

    val out = targetCols.map { c =>
      val updates = m.zipWithIndex.collect { case (UpdateClause(set, _), i) =>
        (i, set.getOrElse(c, col(s"t.$c")))
      }
      val inserts = nm.zipWithIndex.collect { case (InsertClause(values, _), i) =>
        (100 + i, values.getOrElse(c, lit(null)))
      }
      val bySource = nmbs.zipWithIndex.collect { case (UpdateClause(set, _), i) =>
        (200 + i, set.getOrElse(c, col(s"t.$c")))
      }
      (updates ++ inserts ++ bySource).foldRight(col(s"t.$c")) { case ((idx, v), els) =>
        when(col("__action") === idx, v).otherwise(els)
      }.as(c)
    }
    kept.select(out: _*)
  }

  /** Standalone UPDATE (copy-on-write): columns in `set` are replaced
    * where `cond` holds; all other rows/columns pass through. */
  def update(target: DataFrame, set: Map[String, Column], cond: Column): DataFrame = {
    val c = coalesce(cond, lit(false))
    target.select(target.columns.toIndexedSeq.map { name =>
      set.get(name) match {
        case Some(v) => when(c, v).otherwise(col(name)).as(name)
        case None    => col(name)
      }
    }: _*)
  }

  /** Copy-on-write DELETE (M1): rows where `pred` is true are removed;
    * NULL predicate keeps the row (SQL semantics). */
  def delete(target: DataFrame, pred: Column): DataFrame =
    target.filter(!coalesce(pred, lit(false)))
}
