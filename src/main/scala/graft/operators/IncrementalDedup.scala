package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.fingerprint

/** Incremental exact dedup for CONTINUOUS ingestion: novel documents are
  * admitted batch by batch against a persisted fingerprint index, the
  * operational pattern of a training-data intake at 100 TB (the corpus
  * grows forever; each arriving batch is small).
  *
  * The index is a catalog table bucketed by fingerprint, so the
  * index side of the anti-join reads bucket-aligned files with NO
  * Exchange — only the (small) arriving batch shuffles to match the
  * bucket layout, regardless of how large the accumulated index grows.
  * Each admitted batch appends its fingerprints with the same bucket
  * spec, keeping the layout invariant across ingests.
  */
object IncrementalDedup {

  /** Admit the novel documents of `batch`: drop docs whose canonical
    * fingerprint is already in `indexTable` (or seen earlier in the same
    * batch — keep-first on doc_id), then append the admitted
    * fingerprints to the index. Returns the admitted frame.
    */
  def ingest(batch: DataFrame, indexTable: String, buckets: Int = 16): DataFrame = {
    val spark = batch.sparkSession
    val fp = batch.withColumn("fp", fingerprint(col("text")))
      // within-batch keep-first
      .withColumn("__first", min("doc_id").over(Window.partitionBy("fp")))
      .filter(col("doc_id") === col("__first"))
      .drop("__first")
    val novel =
      if (spark.catalog.tableExists(indexTable))
        fp.join(spark.table(indexTable), Seq("fp"), "left_anti")
      else fp
    // materialize BEFORE the index append: the anti-join is lazy, and
    // evaluating it after the append would see the batch's own
    // fingerprints in the index and admit nothing (read-your-own-writes)
    val admitted = novel.localCheckpoint(true)
    if (spark.catalog.tableExists(indexTable))
      admitted.select("fp").write.mode(SaveMode.Append)
        .bucketBy(buckets, "fp").sortBy("fp")
        .format("parquet").saveAsTable(indexTable)
    else
      Bucketing.writeBucketed(admitted.select("fp"), indexTable, "fp", buckets)
    admitted.drop("fp")
  }
}
