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
}
