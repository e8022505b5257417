package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.fingerprint

/** Incremental exact dedup for CONTINUOUS ingestion: novel documents are
  * admitted batch by batch against a persisted fingerprint index, the
  * operational pattern of a training-data intake at 100 TB (the corpus
  * grows forever; each arriving batch is small).
  *
  * The index is an EXTERNAL catalog table bucketed by fingerprint, so
  * the index side of the anti-join reads bucket-aligned files with NO
  * Exchange — only the (small) arriving batch shuffles to match the
  * bucket layout, regardless of how large the accumulated index grows.
  * Each admitted batch appends its fingerprints with the same bucket
  * spec, keeping the layout invariant across ingests.
  *
  * Durability: the table is external (explicit LOCATION), and a session
  * whose catalog has forgotten it (in-memory catalog after restart;
  * with a persistent metastore this never triggers) re-registers the
  * existing location instead of clobbering it — the accumulated index
  * survives restarts.
  */
object IncrementalDedup {

  /** Admit the novel documents of `batch`: drop docs whose canonical
    * fingerprint is already in `indexTable` (or seen earlier in the same
    * batch — keep-first on doc_id), then append the admitted
    * fingerprints to the index. Returns the admitted frame.
    */
  def ingest(batch: DataFrame, indexTable: String, buckets: Int = 16): DataFrame =
    ingestBatch(batch, indexTable, batchKey = "", writeOut = _ => (), buckets)

  /** [[ingest]] with a REPLAY-SAFE ordering for streaming `foreachBatch`
    * sinks: the admitted rows are handed to `writeOut` (which must be
    * idempotent per batch — e.g. overwrite a batch-keyed path) BEFORE
    * the fingerprints are appended to the index, and the anti-join
    * excludes index rows stamped with this `batchKey`. Crash anywhere and
    * the replayed batch recomputes the SAME admitted set (its own
    * index rows, if any landed, are excluded) and overwrites the same
    * output — no admitted doc can be lost to a half-committed batch.
    *
    * `batchKey` must identify the LOGICAL batch across restarts AND
    * across runs: a bare foreachBatch id restarts from 0 when a
    * checkpoint is recreated, and excluding on it alone would unlock an
    * old run's batch-N fingerprints and re-admit duplicates — callers
    * scope it with the streaming query id persisted in the checkpoint
    * ([[graft.streaming.DocStream.intakeToIndex]] stamps
    * `<queryId>#<batchId>`). Empty = batch mode, no exclusion.
    *
    * The one non-idempotent residue: a crash after the index append
    * leaves duplicate `(fp, batch_key)` rows once replayed, which are
    * semantically inert for the anti-join (dedup is set membership).
    */
  def ingestBatch(
      batch: DataFrame,
      indexTable: String,
      batchKey: String,
      writeOut: DataFrame => Unit,
      buckets: Int = 16
  ): DataFrame = {
    val spark = batch.sparkSession
    ensureRegistered(spark, indexTable, buckets)
    val fp = batch.withColumn("fp", fingerprint(col("text")))
      // within-batch keep-first
      .withColumn("__first", min("doc_id").over(Window.partitionBy("fp")))
      .filter(col("doc_id") === col("__first"))
      .drop("__first")
    val novel =
      if (spark.catalog.tableExists(indexTable)) {
        // exclude the replaying batch's OWN index rows (batch-mode key ""
        // excludes nothing). Null-safe: a NULL batch_key (foreign/legacy
        // row) must still gate
        val index =
          if (batchKey.nonEmpty)
            spark.table(indexTable).filter(!(col("batch_key") <=> lit(batchKey)))
          else spark.table(indexTable)
        fp.join(index.select("fp"), Seq("fp"), "left_anti")
      } else fp
    // materialize BEFORE the index append: the anti-join is lazy, and
    // evaluating it after the append would see the batch's own
    // fingerprints in the index and admit nothing (read-your-own-writes)
    val admitted = novel.localCheckpoint(true)
    writeOut(admitted.drop("fp"))
    if (!spark.catalog.tableExists(indexTable)) {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(
        java.net.URI.create(location(spark, indexTable)).getPath))
      spark.sql(
        s"""CREATE TABLE `$indexTable` (fp STRING, batch_key STRING) USING parquet
           |CLUSTERED BY (fp) SORTED BY (fp) INTO $buckets BUCKETS
           |LOCATION '${location(spark, indexTable)}'""".stripMargin)
    }
    admitted.select(col("fp"), lit(batchKey).as("batch_key"))
      .write.mode(SaveMode.Append)
      .bucketBy(buckets, "fp").sortBy("fp")
      .format("parquet").saveAsTable(indexTable)
    admitted.drop("fp")
  }

  /** The index's stable on-disk home under the warehouse dir. */
  private def location(spark: SparkSession, table: String): String =
    java.nio.file.Paths.get(
      java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir")).getPath)
      .resolve(table).toUri.toString

  /** Re-attach an index whose files survived a catalog restart: if the
    * table is unknown to (this session's) catalog but its location holds
    * data, register it as the same external bucketed table rather than
    * letting a fresh create clobber the accumulated fingerprints.
    */
  private def ensureRegistered(spark: SparkSession, table: String, buckets: Int): Unit =
    if (!spark.catalog.tableExists(table)) {
      val loc = java.nio.file.Paths.get(java.net.URI.create(location(spark, table)).getPath)
      if (java.nio.file.Files.exists(loc) &&
        java.nio.file.Files.list(loc).findFirst().isPresent)
        spark.sql(
          s"""CREATE TABLE `$table` (fp STRING, batch_key STRING) USING parquet
             |CLUSTERED BY (fp) SORTED BY (fp) INTO $buckets BUCKETS
             |LOCATION '${location(spark, table)}'""".stripMargin)
    }
}
