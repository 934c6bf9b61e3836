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

  /** The normalized file set of a runtime `IN(_file, ...)` predicate;
    * None for any other predicate shape (caller skips pruning — sound). */
  def inFileSet(p: Predicate): Option[Set[String]] =
    if (p.name() != "IN") None
    else {
      val ch = p.children()
      ch.headOption match {
        case Some(r: NamedReference) if r.fieldNames().sameElements(Array(FILE)) =>
          val vals = ch.tail.flatMap {
            case l: Literal[_] if l.value != null => Some(norm(l.value.toString))
            case _ => None
          }
          // only prune when EVERY member parsed — a partial set would
          // wrongly drop groups
          if (vals.length == ch.length - 1) Some(vals.toSet) else None
        case _ => None
      }
    }
}
