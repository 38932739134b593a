package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.Normalize
import graft.storage.Storage

/** T1 — micro-batched streaming ingest (SURVEY §2.7). The reference
  * buffers converted rows and flushes at ≥1000 pending or 60 s
  * (scripts/ingest/ingestion_job.py:42–43, 78–115) with manual
  * `skip_rows` resume (T3); Structured Streaming gives the same
  * batching via trigger interval + `maxFilesPerTrigger` (the count
  * knob, set on the source) and exactly-once resume via the checkpoint
  * — the A6 dedup job remains as a repair tool, matching the
  * reference's belt-and-braces design.
  *
  * The batch path and the stream path share the converter and
  * Normalize code verbatim: a stream is just the same transform inside
  * foreachBatch.
  */
object StreamingIngest {

  /** Start a submission-format ingest stream: `source` is any
    * readStream DataFrame (file drop dir, socket, …); `convert` is one
    * of ingest.Formats. Defaults mirror the reference's 60 s flush.
    */
  def startSubmissionIngest(
      source: DataFrame,
      convert: DataFrame => DataFrame,
      storage: Storage,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery =
    source.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (snaps, kw, files, hashes) = Normalize.splitChildren(convert(batch))
        storage.append("submission_snapshots", snaps)
        storage.append("submission_snapshot_keywords", kw)
        storage.append("submission_snapshot_files", files)
        storage.append("submission_snapshot_file_hashes", hashes)
      }
      .start()
}
