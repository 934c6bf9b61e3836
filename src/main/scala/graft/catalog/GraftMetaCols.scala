package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.MetadataColumn
import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** The `_file` metadata column: every row can report the data file it was
  * read from (Iceberg's `_file` surface). Besides being queryable
  * (`SELECT _file, count(*) ... GROUP BY _file` for skew forensics), it
  * is the group identity that runtime group filtering keys on: Spark's
  * RowLevelOperationRuntimeGroupFiltering computes the DISTINCT `_file`
  * of rows matching a row-level command's condition and pushes the set
  * into the operation's scan, so a copy-on-write UPDATE/MERGE rewrites
  * only the groups that contain matched rows. */
object GraftMetaCols {
  val FILE = "_file"
  val POS = "_pos"

  object FileColumn extends MetadataColumn {
    override def name: String = FILE
    override def dataType: DataType = StringType
    override def isNullable: Boolean = false
    override def comment: String = "path of the data file the row was read from"
  }

  /** `_pos` — the row's ordinal within its data file (Iceberg's other
    * reserved metadata column): (_file, _pos) is a stable physical row
    * identity, the provenance handle position-level tooling keys on. */
  object PosColumn extends MetadataColumn {
    override def name: String = POS
    override def dataType: DataType = LongType
    override def isNullable: Boolean = false
    override def comment: String = "row position within its data file"
  }

  /** Canonical path form for cross-plan comparison: the DSv2 reader
    * stamps FileStatus paths (`file:/x`), the V1 fallback uses
    * `input_file_name()` (`file:///x`) — both normalize to `/x`. */
  def norm(path: String): String = new Path(path).toUri.getPath

  /** The literal members of a runtime `IN(col, ...)` predicate; None for
    * any other predicate shape OR when any member is null / non-literal —
    * a partial value set would prune wrongly, so it is all-or-nothing
    * (caller skips pruning — sound). Shared by `_file` group filtering
    * and runtime bucket pruning. */
  def inValues(p: Predicate, col: String): Option[Seq[Any]] =
    if (p.name() != "IN") None
    else p.children().headOption match {
      case Some(r: NamedReference)
          if r.fieldNames().length == 1 && r.fieldNames()(0).equalsIgnoreCase(col) =>
        val vals = p.children().tail.flatMap {
          case l: Literal[_] if l.value != null => Some(l.value)
          case _ => None
        }
        if (vals.length == p.children().length - 1) Some(vals.toSeq) else None
      case _ => None
    }

  /** The normalized file set of a runtime `IN(_file, ...)` predicate;
    * None for any other predicate shape (caller skips pruning — sound). */
  def inFileSet(p: Predicate): Option[Set[String]] =
    inValues(p, FILE).map(_.map(v => norm(v.toString)).toSet)
}
