package graft

import org.apache.spark.sql.GraftShim
import org.scalatest.funsuite.AnyFunSuite

/** `GraftShim.dropCheckpointBlocks` — the only way to free an eager
  * localCheckpoint's block-store blocks on demand (Dataset.unpersist
  * goes through the cacheManager and is a no-op for checkpoint RDDs).
  * The operator-level unpersist discipline (kmeansTrain,
  * connectedComponents) and Bench/Verify's between-query sweep both
  * depend on this actually working. */
class ShimBlocksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("dropCheckpointBlocks frees the checkpoint RDD; plain unpersist does not") {
    val sc = spark.sparkContext
    def persistedIds = sc.getPersistentRDDs.keySet

    val before = persistedIds
    val df = spark.range(1000).toDF("id").localCheckpoint(true)
    assert(df.count() == 1000)
    val added = persistedIds -- before
    assert(added.nonEmpty, "eager localCheckpoint must register persisted RDD blocks")

    // the documented failure mode: Dataset.unpersist is a cacheManager
    // call and cannot see checkpoint RDDs
    df.unpersist(blocking = true)
    assert((persistedIds -- before).nonEmpty,
      "Dataset.unpersist should NOT free checkpoint blocks (if this " +
        "starts failing, Spark changed semantics and the shim is redundant)")

    GraftShim.dropCheckpointBlocks(df)
    assert((persistedIds -- before).isEmpty,
      "dropCheckpointBlocks must unpersist the LogicalRDD's backing RDD")
  }

  test("dropCheckpointBlocks is a no-op on non-checkpoint frames") {
    val df = spark.range(10).toDF("id")
    GraftShim.dropCheckpointBlocks(df) // must not throw
    assert(df.count() == 10)
  }
}
