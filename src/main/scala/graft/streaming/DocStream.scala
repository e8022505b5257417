package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.queries.DocQueries

/** Streaming front door of the training-data intake: the per-row
  * quality gates and exact dedup that can run ON THE STREAM, bounding
  * what ever reaches the batch layer. Corpus-global operators (LM
  * scoring, LSH clustering, substring spans) are deliberately NOT here —
  * they need the whole corpus and stay batch-side; this is the
  * continuous filter in front of them.
  *
  * Stream-safety: the Gopher repetition gates are pure per-row
  * expressions ([[DocQueries.repetitionKeep]]); dedup uses
  * `dropDuplicatesWithinWatermark` on the canonical fingerprint, so
  * state is bounded by the watermark horizon (for dedup across the
  * WHOLE history, see [[graft.operators.IncrementalDedup]] — the
  * batch-incremental form with a persisted index).
  */
object DocStream {

  /** Gate + dedup a (streaming or batch) doc frame with `doc_id`,
    * `text`, and a µs arrival-time column. Emits the admitted docs with
    * their canonical fingerprint.
    */
  def intake(docs: DataFrame, tsCol: String,
             watermarkDelay: String = "10 minutes"): DataFrame = {
    val gated = docs
      .withColumn("tk", TextFunctions.tokens(col("text")))
      .withColumn("rs", graft.functions.RepetitionStats.repetition_stats(col("text")))
      .filter(DocQueries.repetitionKeep)
      .drop("tk", "rs")
      .withColumn("fp", TextFunctions.fingerprint(col("text")))
      .withColumn("event_time", timestamp_micros(col(tsCol)))
    val deduped =
      if (gated.isStreaming)
        gated.withWatermark("event_time", watermarkDelay)
          .dropDuplicatesWithinWatermark(Seq("fp"))
      else gated.dropDuplicates("fp")
    deduped.drop("event_time")
  }

  /** The full continuous front door: [[intake]] (stream-side gates +
    * watermark-horizon dedup) composed with
    * [[graft.operators.IncrementalDedup]] per micro-batch, so duplicates
    * that arrive BEYOND the watermark horizon are still rejected against
    * the whole-history fingerprint index (restart-durable, bucketed,
    * Exchange-free on the index side). Admitted docs append to
    * `outPath`; exactly-once comes from the checkpointed batch ids —
    * foreachBatch may replay a batch after a crash, and replays admit
    * nothing because their fingerprints are already indexed (the ingest
    * is idempotent by construction).
    */
  def intakeToIndex(
      docs: DataFrame,
      tsCol: String,
      indexTable: String,
      outPath: String,
      checkpoint: String,
      watermarkDelay: String = "10 minutes"
  ): org.apache.spark.sql.streaming.StreamingQuery =
    intake(docs, tsCol, watermarkDelay).writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // ingest recomputes the canonical fingerprint and keeps first
        // per fp within the batch; drop intake's copy to avoid a clash
        val admitted = graft.operators.IncrementalDedup.ingest(batch.drop("fp"), indexTable)
        admitted.write.mode("append").parquet(outPath)
      }
      .start()
}
