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
    * [[graft.operators.IncrementalDedup.ingestBatch]] per micro-batch,
    * so duplicates that arrive BEYOND the watermark horizon are still
    * rejected against the whole-history fingerprint index
    * (restart-durable, bucketed, Exchange-free on the index side).
    * Admitted docs land under `outPath/batch_id=<id>/` (read the root
    * as one PARTITIONED parquet dataset — consumers that previously read
    * `outPath` as a flat non-partitioned directory must switch to
    * partition discovery, and an `outPath` holding flat files from a
    * pre-batch-subdirectory run should start a fresh root rather than
    * mixing the two layouts). Effectively-once: each batch's
    * output is an OVERWRITE of its own batch-keyed directory, written
    * BEFORE the index append, and the anti-join excludes index rows
    * stamped with the replaying batch's id — so a crash at any point
    * replays to the identical admitted set and the identical output,
    * instead of silently dropping docs whose fingerprints were indexed
    * but never written out.
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
      .foreachBatch {
        // the query id is immutable for the life of the query — read the
        // checkpoint's metadata file once at first batch, not per trigger
        // (each read is a filesystem/object-store round-trip + a parse)
        var qid: String = null
        (batch: DataFrame, batchId: Long) =>
        if (qid == null) qid = queryId(checkpoint)
        // ingest recomputes the canonical fingerprint and keeps first
        // per fp within the batch; drop intake's copy to avoid a clash.
        // The batch key is scoped by the streaming QUERY id (persisted in
        // the checkpoint, stable across restarts, fresh when the
        // checkpoint is recreated) so replay exclusion can never unlock
        // an OLD run's rows when foreachBatch ids restart from 0.
        graft.operators.IncrementalDedup.ingestBatch(
          batch.drop("fp"), indexTable, s"$qid#$batchId",
          writeOut = admitted =>
            admitted.write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId"))
        ()
      }
      .start()

  /** The streaming query id from the checkpoint's metadata file — written
    * at query start, so it exists by the time any foreachBatch runs.
    * Unreadable metadata degrades to batch-id-only scoping (the key stays
    * non-empty, so same-run replay exclusion still works).
    */
  private def queryId(checkpoint: String): String =
    try {
      import org.json4s._
      (jackson.JsonMethods.parse(java.nio.file.Files.readString(
        java.nio.file.Paths.get(checkpoint, "metadata"))) \ "id") match {
        case JString(id) => id
        case _           => ""
      }
    } catch { case _: Exception => "" }
}
