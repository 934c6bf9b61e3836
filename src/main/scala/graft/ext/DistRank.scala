package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global ranking — the scale path for `row_number() OVER
  * (ORDER BY …)`, which Spark otherwise executes as ONE window partition
  * holding the whole input.
  *
  * Construction: range-repartition on the FULL sort key, rank locally
  * inside each partition, and add broadcast per-partition row-count
  * offsets. Because the range key is a total order (callers must include
  * a unique tiebreak column), equal prefix keys are split across
  * partitions by the tiebreak — no indivisible tie class can concentrate
  * in one partition, so the decomposition is skew-proof where a
  * quantized-bin decomposition (domainMixQuantile's 4096 md5 bins) would
  * stall on a giant tie. The emitted rank is partition-boundary-INDEPENDENT:
  * offsets + local ranks reconstruct the exact global row_number at any
  * parallelism, so sampling-chosen range boundaries (or AQE coalescing
  * of contiguous range partitions, which preserves key order) cannot
  * change a single output value — which is what lets the existing
  * single-window DuckDB oracles keep grading these queries unchanged.
  *
  * Determinism note: `spark_partition_id()` is stable here because the
  * range exchange is deterministic for identical input (boundary
  * sampling is seeded per partition index), and plans that consume the
  * ranked frame more than once either reuse the exchange or recompute
  * it bit-identically. */
object DistRank {

  /** `df` + a 0-based LongType global rank column `rnCol` over the total
    * order `order` — value-identical to
    * `row_number().over(Window.orderBy(order: _*)) - 1`. */
  def withGlobalRank(df: DataFrame, rnCol: String, order: Column*): DataFrame = {
    require(order.nonEmpty, "withGlobalRank needs a sort key")
    val tmpPid = "__graft_rank_pid"; val tmpLrn = "__graft_rank_lrn"
    require(!df.columns.contains(tmpPid) && !df.columns.contains(tmpLrn),
      s"input must not carry $tmpPid/$tmpLrn columns")
    val nParts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df.repartitionByRange(nParts, order: _*)
      .withColumn(tmpPid, spark_partition_id())
    val local = parted.withColumn(tmpLrn,
      row_number().over(Window.partitionBy(col(tmpPid)).orderBy(order: _*))
        .cast(LongType))
    // one row per partition — metadata scale; the prefix-sum window over
    // it is nParts rows, not the corpus
    val offsets = local.groupBy(col(tmpPid)).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(
        Window.orderBy(col(tmpPid))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(tmpPid), col("__off"))
    local.join(broadcast(offsets), tmpPid)
      .withColumn(rnCol, col("__off") + col(tmpLrn) - 1)
      .drop(tmpPid, tmpLrn, "__off")
  }
}
