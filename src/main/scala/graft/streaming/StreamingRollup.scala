package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.rollup.TranscriptStore

/** Structured Streaming wrapper around the batch pipeline (SURVEY.md
  * §2.8): `foreachBatch` funnels each micro-batch through the SAME
  * `ingest → rollupIncremental` path the batch jobs use, so streaming
  * and batch share one exactly-once implementation — the snapshot
  * watermark in each tier commit makes a replayed micro-batch (after
  * a sink-side crash) converge to the same tiers rather than
  * double-count.
  *
  * The engine remains batch-incremental by design (snapshot id ==
  * watermark analog); this wrapper is for sources that arrive as
  * streams (file drops, Kafka) without changing rollup semantics.
  */
object StreamingRollup {

  /** Attach the pipeline to any streaming Dataset of turn-shaped rows.
    * Caller starts/stops the query (or uses [[runOnce]]).
    */
  def writer(stream: DataFrame, store: TranscriptStore): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          store.ingest(batch)
          store.rollupIncremental()
          ()
        }
      }

  /** Drain everything currently available, then stop — the batch-like
    * invocation used by tests and catch-up jobs.
    */
  def runOnce(stream: DataFrame, store: TranscriptStore, checkpointDir: String): Unit = {
    val q: StreamingQuery = writer(stream, store)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
