package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join utilities (SURVEY.md §7.4 scale discipline).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; explicit
  * salting remains the tool when one key dominates so heavily that even
  * split partitions bottleneck, or when AQE is unavailable (streaming
  * joins). `saltedJoin` decorrelates a hot key across `factor` reducers:
  * the large (skewed) side gets a deterministic per-row salt, the small
  * side is replicated once per salt value, and the join key becomes
  * (key, salt). Semantics are exactly inner-join-on-key.
  */
object ScaleJoins {

  /** Inner equi-join with the LEFT side salted across `factor` buckets.
    * `left` is the large/skewed side; `right` is replicated ×factor (keep
    * it the smaller input). Deterministic: the salt comes from hashing
    * the left row's full content, not from rand(). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(factor)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
