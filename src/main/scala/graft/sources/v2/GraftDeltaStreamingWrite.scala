package graft.sources.v2

import java.util.UUID

import graft.sources.{DeltaBridge, TxLog}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.GraftParquetBridge
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** `df.writeStream.toTable("graft.`/path`")` — the exactly-once streaming
  * sink through the SQL catalog (the V1 `format("graft-delta")` sink's
  * semantics on the V2 `StreamingWrite` contract Spark requires of
  * catalog tables):
  *
  *  - executors write each epoch's rows straight to parquet through
  *    Spark's OWN prepared writer factory ([[GraftParquetBridge]] — the
  *    same `ParquetWriteSupport` a batch write codegens, so streaming
  *    files are byte-compatible with batch files), into an immutable
  *    per-epoch stage dir under the table;
  *  - the driver's `commit(epoch)` lands the file list as ONE TxLog
  *    commit via [[TxLog.appendBatchStaged]] — the epoch id rides the
  *    commit record, so a restart's replayed epoch is recognized and
  *    creates no second version (its re-staged files are vacuum-
  *    collectable orphans) — then exports the `_delta_log`, one
  *    mountable Delta version per micro-batch.
  *
  * Scale shape: the data path is executor-parallel parquet encoding; the
  * driver handles only file NAMES per epoch. Zero-row tasks delete their
  * empty file and commit nothing. Append-only like the V1 sink. */
private[v2] case class GraftDeltaStreamingWrite(table: String,
                                                schema: StructType,
                                                queryId: String)
  extends StreamingWrite {

  private val (factory, conf) =
    GraftParquetBridge.writerFactory(SparkSession.active, schema)
  private val serConf = new SerializableConfiguration(conf)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    GraftDeltaStreamingWriterFactory(table, schema, factory, serConf)

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages
      .collect { case m: GraftDeltaFileCommit => m.relPath }
      .flatten.sorted
    // a ZERO-ROW epoch commits nothing: an idle trigger must not mint a
    // TxLog version + an empty exported commit file per tick (version
    // churn; some foreign Delta readers reject empty commits — ADVICE
    // r13). Replay-safe either way: a replayed empty epoch is a no-op
    // whether or not its id was ever recorded.
    if (staged.nonEmpty) {
      // idempotence is keyed on (queryId, epochId) — delta-spark's txn
      // (appId, version) rule: two INDEPENDENT queries streaming into the
      // same table both start at epoch 0 and must not swallow each other's
      // batches (review finding r13); queryId is the STABLE streaming id
      // (checkpoint-persisted), so a restart's replayed epoch still dedups
      TxLog.appendBatchStaged(table, epochId, staged.toIndexedSeq,
        appId = Some(queryId))
      // replay-safe: a re-delivered epoch committed nothing above, and the
      // export cursor makes re-exporting published versions a no-op
      DeltaBridge.exportLog(SparkSession.active, table)
    }
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: GraftDeltaFileCommit => m.relPath }
      .flatten.foreach { rel =>
        try java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(table, rel))
        catch { case _: java.io.IOException => () } // orphan → vacuum
      }

  override def toString: String = s"GraftDeltaStreamingWrite[$table]"
}

/** One staged file per non-empty task (None for zero-row tasks). */
private[v2] case class GraftDeltaFileCommit(relPath: Option[String])
  extends WriterCommitMessage

private[v2] case class GraftDeltaStreamingWriterFactory(
    table: String, schema: StructType, factory: OutputWriterFactory,
    conf: SerializableConfiguration)
  extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val rel = s"stage-stream-e$epochId/" +
      f"part-$partitionId%05d-${UUID.randomUUID().toString.take(8)}.parquet"
    val abs = new org.apache.hadoop.fs.Path(s"$table/$rel")
    val fs = abs.getFileSystem(conf.value)
    fs.mkdirs(abs.getParent)
    val writer = GraftParquetBridge.newWriter(
      factory, abs.toString, schema, conf.value, partitionId, taskId)
    new DataWriter[InternalRow] {
      private var rows = 0L
      override def write(record: InternalRow): Unit = {
        writer.write(record); rows += 1
      }
      override def commit(): WriterCommitMessage = {
        writer.close()
        if (rows == 0L) { // keep the table free of empty files
          fs.delete(abs, false)
          GraftDeltaFileCommit(None)
        } else GraftDeltaFileCommit(Some(rel))
      }
      override def abort(): Unit = {
        try { writer.close(); fs.delete(abs, false) }
        catch { case scala.util.control.NonFatal(_) => () }
      }
      override def close(): Unit = ()
    }
  }
}
