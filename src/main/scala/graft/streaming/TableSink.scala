package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.io.TableIO

/** Streaming sink into the graft snapshot table layer with
  * exactly-once batch commits — the `writeStream.format("iceberg")`
  * surface re-expressed over manifests.
  *
  * Structured Streaming's foreachBatch is at-least-once: after a
  * failure the engine replays the last uncommitted micro-batch, so a
  * sink that blindly appends duplicates it. The guard is the batch-id
  * high-water mark persisted in the table's meta directory in the
  * SAME place as the snapshots: a replayed batch id <= the mark is
  * skipped, so each micro-batch commits exactly one snapshot. (The
  * mark is per-table; one streaming query per table, consistent with
  * the single-writer commit model.)
  */
object TableSink {

  /** Commit one micro-batch: append + advance the high-water mark,
    * skipping batch ids at or below it. Returns whether a snapshot was
    * committed — factored out of the stream wiring so the replay
    * guard is directly testable.
    */
  def commitStreamBatch(io: TableIO, table: String, batchId: Long, batch: DataFrame,
                        partitionCols: Seq[String] = Seq.empty): Boolean = {
    val mark = io.catalog.streamBatchMark(table)
    if (mark.exists(_ >= batchId)) false
    else {
      io.append(batch, table, partitionCols)
      io.catalog.writeStreamBatchMark(table, batchId)
      true
    }
  }

  /** Wire a streaming DataFrame into a table: every micro-batch is one
    * snapshot commit, replays are no-ops.
    */
  def appendStream(stream: DataFrame, io: TableIO, table: String, checkpoint: String,
                   partitionCols: Seq[String] = Seq.empty): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        commitStreamBatch(io, table, id, batch, partitionCols); ()
      }
      .start()
}
