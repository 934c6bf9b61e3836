package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{GraftShim, SparkSession}
import org.apache.spark.sql.connector.write.{DataWriterFactory, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}
import graft.table.GraftTable

import java.util.UUID

/** Structured-Streaming sink for graft tables — what makes
  * `df.writeStream.format("graft").option("path", dir)` and
  * `df.writeStream.toTable("graft.ns.t")` work (the streaming
  * counterpart of the reference's batch writers; Iceberg exposes the
  * same surface as its streaming write).
  *
  * Micro-batch shape: per epoch Spark asks for a fresh writer factory,
  * executors stream rows straight into parquet files in an
  * epoch-private data dir (no double-buffering), and [[commit]] stamps
  * ONE snapshot through the OCC log. Exactly-once comes from the
  * snapshot's `streamEpochs` ledger — after a failure Spark re-runs the
  * last epoch, the ledger shows it committed, and the retry becomes a
  * no-op (the duplicate dir is deleted). Output modes: append →
  * snapshot append; complete (aggregate streams) → snapshot overwrite.
  *
  * Unpartitioned/unsorted tables commit the executor files as-is (zero
  * write amplification). Partitioned/sorted tables re-route the epoch's
  * files through the table's clustering write path (partition dirs,
  * key-sorted layout) — one extra local write per epoch, the price of
  * maintaining the layout contract (the same trade Iceberg's fanout
  * writer makes).
  */
final class GraftStreamingWrite(dir: String, querySchema: StructType,
                                queryId: String, replace: Boolean,
                                upsertKeys: Seq[String] = Seq.empty,
                                upsertOrderBy: Option[String] = None)
    extends StreamingWrite {

  require(!(replace && upsertKeys.nonEmpty),
    "complete mode with upsertKeys is contradictory (complete already " +
      "replaces the whole result); use update or append mode")

  private def spark: SparkSession = SparkSession.active

  // one epoch in flight at a time per query (micro-batch execution is
  // driver-serial), so the factory→commit handoff is a plain field
  @volatile private var currentSub: String = _

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val snap = GraftTable.load(spark, dir).snapshot
    currentSub = s"data/${UUID.randomUUID()}"
    val physSchema = GraftStagedFiles.physSchemaOf(snap, querySchema)
    val (factory, conf) = GraftShim.parquetWriterFactory(spark, physSchema)
    val batch = new GraftParquetWriterFactory(s"$dir/$currentSub", physSchema, factory, conf)
    (partitionId: Int, taskId: Long, _: Long) => batch.createWriter(partitionId, taskId)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val sub = currentSub
    val rows = messages.collect { case m: GraftFileCommit => m.rows }.sum
    val t = GraftTable.load(spark, dir)
    val snap = t.snapshot
    if (rows == 0L) {
      // empty epoch: appending nothing is a no-op (an unrecorded retry
      // re-commits nothing); COMPLETE of nothing must truncate, through
      // the write path that handles empty frames
      deleteDir(sub)
      if (replace) t.streamEpochWrite(t.toDF.limit(0), queryId, epochId, replace = true)
      return
    }
    val committed =
      if (upsertKeys.nonEmpty) {
        // upsert mode (update-mode CDC sink): the epoch's rows become
        // one merge-on-read rowDelta keyed by upsertKeys
        val df = GraftStagedFiles.readLogical(spark, dir, sub, snap, querySchema)
        val ok = t.streamEpochUpsert(df, upsertKeys, queryId, epochId, upsertOrderBy)
        deleteDir(sub) // raw epoch dir is scratch on this path
        ok
      } else if (snap.spec.isEmpty && snap.key.isEmpty)
        t.commitStreamEpoch(queryId, epochId, sub, rows, replace)
      else {
        // layout-maintaining path: read the epoch's raw files back and
        // run them through the table's partitioning/clustering write
        val df = GraftStagedFiles.readLogical(spark, dir, sub, snap, querySchema)
        val ok = t.streamEpochWrite(df, queryId, epochId, replace)
        deleteDir(sub) // raw epoch dir is scratch on this path
        ok
      }
    if (!committed) deleteDir(sub) // retried epoch: already in the log
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    if (currentSub != null) deleteDir(currentSub)

  private def deleteDir(sub: String): Unit = {
    val p = new Path(s"$dir/$sub")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
