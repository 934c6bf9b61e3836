package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native signature expressions for the dedup pipeline. The HOF
  * formulations (`transform(sequence(0,63), i -> array_min(transform(
  * toks, t -> xxhash64(t, i))))` and the per-token 64-long bit-vote
  * arrays) allocate interpreted lambda frames and intermediate arrays per
  * token; these expressions hash each token ONCE (xxh64, the same hash
  * family Spark's `xxhash64` uses) and derive everything else with
  * integer arithmetic in a tight loop.
  *
  * MinHash uses the standard double-hashing construction
  * `g_i(x) = h1(x) + i*h2(x)` (two independent 64-bit hashes simulate k
  * permutations), so the per-doc cost is O(tokens + k) arithmetic instead
  * of O(tokens*k) hashing.
  */
abstract class TokenSignature extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> or array<bigint>, got ${t.sql}")
  }
  /** Tokens may arrive pre-hashed (`array<bigint>`, e.g. the dedup
    * pipeline's `htoks`): signatures then hash the 8-byte value instead
    * of the string bytes — same hash family, same independence, but the
    * arrays shuffling/broadcasting through the plan stay fixed-width. */
  protected final def longInput: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  protected final def hash(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
  protected final val xxh64Class: String = classOf[XXH64].getName
}

/** k-permutation MinHash signature of a token array → array<bigint>. */
case class MinHashSignature(child: Expression, k: Int) extends TokenSignature {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    val longs = longInput
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        var h1 = 0L; var h2 = 0L
        if (longs) {
          val v = arr.getLong(i)
          h1 = XXH64.hashLong(v, 0x9747b28cL)
          h2 = XXH64.hashLong(v, 0x85ebca6bL) | 1L
        } else {
          val s = arr.getUTF8String(i)
          h1 = hash(s, 0x9747b28cL)
          h2 = hash(s, 0x85ebca6bL) | 1L // odd => full-period mixing
        }
        var j = 0
        var g = h1
        while (j < k) {
          if (g < mins(j)) mins(j) = g
          g += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val mins = ctx.freshName("mins"); val s = ctx.freshName("s")
      val h1 = ctx.freshName("h1"); val h2 = ctx.freshName("h2"); val g = ctx.freshName("g")
      val hashes =
        if (longInput)
          s"""long $h1 = $xxh64Class.hashLong($c.getLong($i), ${0x9747b28cL}L);
             |    long $h2 = $xxh64Class.hashLong($c.getLong($i), ${0x85ebca6bL}L) | 1L;""".stripMargin
        else
          s"""org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($i);
             |    long $h1 = $xxh64Class.hashUnsafeBytes(
             |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${0x9747b28cL}L);
             |    long $h2 = $xxh64Class.hashUnsafeBytes(
             |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${0x85ebca6bL}L) | 1L;""".stripMargin
      s"""
         |int $n = $c.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    $hashes
         |    long $g = $h1;
         |    for (int $j = 0; $j < $k; $j++) {
         |      if ($g < $mins[$j]) $mins[$j] = $g;
         |      $g += $h2;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array → bigint: per-token hash bits vote,
  * sign of each vote becomes the fingerprint bit. */
case class SimHash(child: Expression) extends TokenSignature {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h =
          if (longInput) XXH64.hashLong(arr.getLong(i), 42L)
          else hash(arr.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val b2 = ctx.freshName("b2")
      val votes = ctx.freshName("votes"); val s = ctx.freshName("s")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      val hashLine =
        if (longInput)
          s"long $h = $xxh64Class.hashLong($c.getLong($i), 42L);"
        else
          s"""org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($i);
             |    long $h = $xxh64Class.hashUnsafeBytes(
             |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);""".stripMargin
      s"""
         |int $n = $c.numElements();
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    $hashLine
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b2 = 0; $b2 < 64; $b2++) {
         |  if ($votes[$b2] > 0) $out |= (1L << $b2);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Intersection size of two SORTED, DISTINCT `array<string>` (or
  * `array<bigint>`) columns via
  * a two-pointer merge — O(|a|+|b|) with zero per-row allocation. The
  * `size(array_intersect(a,b))` formulation builds a hash set per row;
  * on a verify stage touching millions of candidate pairs that hash-set
  * churn dominates. Jaccard follows without `array_union`:
  * `inter / (size(a)+size(b)-inter)` (exact for distinct inputs).
  * Precondition (unchecked): both arrays ascending per UTF8String binary
  * order — exactly what `array_sort(array_distinct(...))` produces.
  * Null elements are skipped (cannot occur from `split`). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_count requires two array<string> or two " +
          s"array<bigint> inputs, got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  private def longInput: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val la = x.numElements(); val lb = y.numElements()
    val longs = longInput
    var i = 0; var j = 0; var c = 0
    while (i < la && j < lb) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val cmp =
          if (longs) java.lang.Long.compare(x.getLong(i), y.getLong(j))
          else x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val la = ctx.freshName("la"); val lb = ctx.freshName("lb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val compare =
        if (longInput) s"Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |int $la = $a.numElements();
         |int $lb = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $la && $j < $lb) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    int $cmp = $compare;
         |    if ($cmp == 0) { $c++; $i++; $j++; }
         |    else if ($cmp < 0) { $i++; }
         |    else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TextSignatureFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature", exprs => exprs match {
        case Seq(c) => MinHashSignature(c, 64)
        case Seq(c, k) => MinHashSignature(c,
          k.eval().asInstanceOf[Number].intValue())
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash", exprs => SimHash(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)), "scala_udf")
  }
  def minhash_signature(toks: Column, k: Int): Column =
    call_function("minhash_signature", toks, org.apache.spark.sql.functions.lit(k))
  def simhash(toks: Column): Column = call_function("simhash", toks)
  def sorted_intersect_count(a: Column, b: Column): Column =
    call_function("sorted_intersect_count", a, b)
}
