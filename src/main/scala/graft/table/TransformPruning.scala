package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.GraftShim.{AttrNode, FnNode, LitNode, Node}
import org.apache.spark.sql.types._

/** Iceberg-style partition-transform predicate derivation: given a user
  * predicate on a transform's SOURCE column, derive the implied predicate
  * on the DERIVED partition column so Parquet footer min/max stats (and
  * the k=v layout) can skip files — the pruning Iceberg does through its
  * transform spec, SURVEY.md §4 "partition pruning" row.
  *
  * Works on Spark 4's `ColumnNode` tree (what a `Column` wraps before
  * analysis). Soundness: each derived predicate is implied by (never
  * narrower than) the original, so conjoining it cannot change results —
  * it only lets the scan skip data that could not match.
  *
  *  - month: monotonic, so =/</<=/>/>= map to the same comparison on the
  *    "yyyy-MM" string (lexicographic = chronological); strict
  *    inequalities relax to >=/<= at month granularity.
  *  - truncate: prefix/floor is monotonic, same mapping.
  *  - bucket: only equality/IN derive (ranges don't survive hashing).
  *  - identity: the derived column IS the source column — nothing to do.
  */
object TransformPruning {

  /** Derived predicates for `pred` under `spec`, as a conjunction to AND
    * into the scan filter (None when nothing derivable).
    *
    * `includeIdentity` additionally derives for identity transforms (the
    * derived predicate is then just the original equality/range restated
    * on the same column) — redundant for in-file filtering, but it is
    * what lets [[GraftTable.scan]] prune identity-partitioned
    * DIRECTORIES before listing a single file. */
  def derive(spec: Seq[PartitionField], schema: StructType, pred: Column,
             includeIdentity: Boolean = false,
             zone: java.time.ZoneId = java.time.ZoneOffset.UTC): Option[Column] = {
    // a struct field reference (s.x) is indistinguishable from an
    // alias-qualified column (t.x) in the unresolved ColumnNode tree —
    // both reduce to their last name part. On a schema with struct
    // columns a predicate on s.x could therefore masquerade as one on a
    // top-level column x and derive WRONG pruning; skip derivation
    // entirely there (pruning is an optimization, never load-bearing).
    if (schema.fields.exists(_.dataType.isInstanceOf[StructType])) return None
    val fields = if (includeIdentity) spec else spec.filterNot(_.transform == "identity")
    val parts = fields.flatMap { pf =>
      deriveFor(pf, schema(pf.source).dataType, GraftShim.toNode(pred), zone)
    }
    parts.reduceOption(_ && _)
  }

  private def attrNameOf(n: Node): Option[String] = n match {
    case AttrNode(name) => Some(name.split('.').last)
    case _ => None
  }

  private val rangeOps = Set(">", ">=", "<", "<=")

  private def deriveFor(pf: PartitionField, srcType: DataType,
                        n: Node, zone: java.time.ZoneId): Option[Column] = {
    val d = col(pf.name)
    def mapped(v: Any): Option[Column] = transformLiteral(pf, srcType, v, zone)
    def isSource(x: Node) = attrNameOf(x).exists(_.equalsIgnoreCase(pf.source))
    n match {
      case f: FnNode if f.name.equalsIgnoreCase("and") && f.args.length == 2 =>
        (deriveFor(pf, srcType, f.args(0), zone), deriveFor(pf, srcType, f.args(1), zone)) match {
          case (Some(a), Some(b)) => Some(a && b)
          case (a, b) => a.orElse(b)
        }
      // OR is derivable only when BOTH branches derive (else unsound)
      case f: FnNode if f.name.equalsIgnoreCase("or") && f.args.length == 2 =>
        for (a <- deriveFor(pf, srcType, f.args(0), zone);
             b <- deriveFor(pf, srcType, f.args(1), zone)) yield a || b
      case f: FnNode if f.name == "=" && f.args.length == 2 =>
        f.args match {
          case Seq(a, LitNode(v)) if isSource(a) => mapped(v).map(d === _)
          case Seq(LitNode(v), a) if isSource(a) => mapped(v).map(d === _)
          case _ => None
        }
      case f: FnNode if f.name.equalsIgnoreCase("in") && f.args.nonEmpty
          && isSource(f.args.head)
          && f.args.tail.forall(_.isInstanceOf[LitNode]) =>
        val ms = f.args.tail.map(l => mapped(l.asInstanceOf[LitNode].value))
        if (ms.nonEmpty && ms.forall(_.isDefined)) Some(ms.flatten.map(d === _).reduce(_ || _))
        else None
      case f: FnNode if rangeOps(f.name) && f.args.length == 2
          && pf.transform != "bucket"
          && pf.transform != "ibucket" => // ranges don't survive hashing
        val cmp = f.name
        f.args match {
          case Seq(a, LitNode(v)) if isSource(a) =>
            mapped(v).map(m => if (cmp.startsWith(">")) d >= m else d <= m)
          case Seq(LitNode(v), a) if isSource(a) => // flipped: lit < col etc.
            mapped(v).map(m => if (cmp.startsWith(">")) d <= m else d >= m)
          case _ => None
        }
      case _ => None
    }
  }

  /** The literal's value under the transform, as a Column literal.
    * ColumnNode literals carry plain Scala/Java values. */
  private def transformLiteral(pf: PartitionField, srcType: DataType,
                               v: Any, zone: java.time.ZoneId): Option[Column] = pf.transform match {
    case "identity" => Some(lit(v).cast(srcType))
    case "month" => monthOf(v, zone).map(lit)
    case "truncate" => v match {
      case s: String => Some(lit(s.take(pf.param)))
      case n: java.lang.Number
          if Set[DataType](LongType, IntegerType, ShortType, ByteType).contains(srcType) =>
        val x = n.longValue()
        Some(lit(x - java.lang.Math.floorMod(x, pf.param.toLong)))
      case _ => None
    }
    case "bucket" =>
      // same hash family as the write path: pmod(hash(value), n) — a
      // constant expression Catalyst folds at plan time. The literal MUST
      // be cast to the source column's type first: Murmur3 hashes Int 5
      // and Long 5L differently, and the write path hashed the typed
      // column value.
      Some(pmod(hash(lit(v).cast(srcType)), lit(pf.param)))
    case "ibucket" =>
      // same rule, Iceberg-exact hash: the cast matters less here (the
      // Iceberg layout widens every integral to long) but strings vs
      // numerics still hash differently, so mirror the write path exactly
      Some(GraftShim.column(graft.functions.IcebergBucket(
        GraftShim.expression(lit(v).cast(srcType)), pf.param)))
    case _ => None
  }

  /** Point-lookup conjuncts of `pred`: every top-level-ANDed `col = lit`
    * or `col IN (lits)` as (column, candidate values). Each entry must
    * independently hold for a row to match — a data dir whose bloom
    * rejects ALL candidate values of any entry cannot contain matches. */
  def pointConjuncts(pred: Column): Seq[(String, Seq[Any])] = {
    def walk(n: Node): Seq[(String, Seq[Any])] = n match {
      case f: FnNode if f.name.equalsIgnoreCase("and") && f.args.length == 2 =>
        walk(f.args(0)) ++ walk(f.args(1))
      case f: FnNode if f.name == "=" && f.args.length == 2 =>
        f.args match {
          case Seq(a, LitNode(v)) => attrNameOf(a).map(c => (c, Seq(v))).toSeq
          case Seq(LitNode(v), a) => attrNameOf(a).map(c => (c, Seq(v))).toSeq
          case _ => Seq.empty
        }
      case f: FnNode if f.name.equalsIgnoreCase("in") && f.args.nonEmpty
          && f.args.tail.nonEmpty && f.args.tail.forall(_.isInstanceOf[LitNode]) =>
        attrNameOf(f.args.head)
          .map(c => (c, f.args.tail.map(_.asInstanceOf[LitNode].value))).toSeq
      case _ => Seq.empty
    }
    walk(GraftShim.toNode(pred))
  }

  /** Comparison conjuncts of `pred`: every top-level-ANDed
    * `col <op> lit` (op ∈ =, IN, >, >=, <, <=; flipped literals are
    * normalized) as (column, op, candidate values). Each entry must
    * independently hold for a row to match — a data dir whose logged
    * [min, max] range for the column cannot satisfy any entry holds no
    * matching rows. */
  def rangeConjuncts(pred: Column): Seq[(String, String, Seq[Any])] = {
    val flip = Map(">" -> "<", ">=" -> "<=", "<" -> ">", "<=" -> ">=")
    def walk(n: Node): Seq[(String, String, Seq[Any])] = n match {
      case f: FnNode if f.name.equalsIgnoreCase("and") && f.args.length == 2 =>
        walk(f.args(0)) ++ walk(f.args(1))
      case f: FnNode if f.name == "=" && f.args.length == 2 =>
        f.args match {
          case Seq(a, LitNode(v)) => attrNameOf(a).map(c => (c, "=", Seq(v))).toSeq
          case Seq(LitNode(v), a) => attrNameOf(a).map(c => (c, "=", Seq(v))).toSeq
          case _ => Seq.empty
        }
      case f: FnNode if f.name.equalsIgnoreCase("in") && f.args.length >= 2
          && f.args.tail.forall(_.isInstanceOf[LitNode]) =>
        attrNameOf(f.args.head)
          .map(c => (c, "in", f.args.tail.map(_.asInstanceOf[LitNode].value))).toSeq
      case f: FnNode if rangeOps(f.name) && f.args.length == 2 =>
        f.args match {
          case Seq(a, LitNode(v)) => attrNameOf(a).map(c => (c, f.name, Seq(v))).toSeq
          case Seq(LitNode(v), a) => attrNameOf(a).map(c => (c, flip(f.name), Seq(v))).toSeq
          case _ => Seq.empty
        }
      case _ => Seq.empty
    }
    walk(GraftShim.toNode(pred))
  }

  /** yyyy-MM of a temporal literal, read the way the WRITE side reads it:
    * `date_format(col, "yyyy-MM")` renders instants in the SESSION time
    * zone, so instant-typed literals (Timestamp/Instant) must convert
    * through the same `zone` — a UTC (or JVM-default) reading here would
    * derive the wrong month near month boundaries and silently prune
    * dirs that DO hold matching rows (and mis-filter rows, since the
    * derived predicate is conjoined into the scan). Zone-free literals
    * (Date/LocalDate/LocalDateTime) carry their own calendar fields and
    * need no conversion: Spark resolves a LocalDateTime against an
    * instant column via the session zone and date_format converts back
    * through the same zone, so its yyyy-MM is already correct. */
  private def monthOf(v: Any, zone: java.time.ZoneId): Option[String] = v match {
    case d: java.sql.Date => Some(d.toLocalDate.toString.substring(0, 7))
    case d: java.time.LocalDate => Some(d.toString.substring(0, 7))
    case t: java.sql.Timestamp =>
      Some(t.toInstant.atZone(zone).toLocalDate.toString.substring(0, 7))
    case t: java.time.LocalDateTime => Some(t.toLocalDate.toString.substring(0, 7))
    case t: java.time.Instant =>
      Some(t.atZone(zone).toLocalDate.toString.substring(0, 7))
    case _ => None
  }
}
