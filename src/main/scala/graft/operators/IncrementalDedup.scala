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
    * semantically inert for the anti-join (dedup is set membership) —
    * [[compact]] reclaims them offline so the index stays bounded by its
    * live fingerprint set.
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
    // fingerprints in the index and admit nothing (read-your-own-writes).
    // This is a SEMANTIC lineage cut, not a reuse pin — a recomputable
    // persist would be WRONG here, because a block recomputed after the
    // append replays the anti-join against the mutated index
    val admitted = Reuse.lineageCut(novel, eager = true)
    writeOut(admitted.drop("fp"))
    if (!spark.catalog.tableExists(indexTable)) {
      java.nio.file.Files.createDirectories(dirPath(spark, indexTable))
      spark.sql(createDdl(spark, indexTable, buckets))
    }
    admitted.select(col("fp"), lit(batchKey).as("batch_key"))
      .write.mode(SaveMode.Append)
      .bucketBy(buckets, "fp").sortBy("fp")
      .format("parquet").saveAsTable(indexTable)
    admitted.drop("fp")
  }

  /** Keep-first index compaction: collapse to ONE row per fingerprint,
    * removing the inert `(fp, batch_key)` residue that crash-replays and
    * checkpoint-recreated runs append over time — without it a
    * long-running intake's index grows past its live fingerprint set.
    * The survivor keeps the smallest batch_key (NULL reads as "", so
    * legacy rows lose ties deterministically); membership — the only
    * thing the anti-join consults — is unchanged.
    *
    * Run this OFFLINE, between ingests (the VACUUM discipline): a batch
    * that crashed mid-append and is replayed AFTER its residue was
    * compacted away under another run's key would see its docs as
    * already-indexed and re-admit nothing — exactly the cross-run
    * re-admission rule, but decided by the compactor instead of the
    * exclusion filter.
    *
    * The compacted set is staged as a sibling bucketed table, then
    * swapped in with directory renames (at cluster scale the same moves
    * via `FileSystem.rename`), so the bucket layout — and the
    * no-Exchange anti-join it guarantees — survives compaction.
    *
    * Crash-safe swap: the live directory is RENAMED ASIDE (not deleted)
    * before the staging directory takes its place, and only then is the
    * retired copy removed — at no instant does the index exist solely as
    * a half-deleted tree. A crash between the two renames leaves the old
    * index intact under `<table>__retiring`, which [[ensureRegistered]]
    * restores on the next touch; a crash after both renames leaves the
    * compacted index live and only the retired copy to sweep. Either way
    * no fingerprint is ever lost — the failure the naive
    * delete-then-move ordering invites (index gone, next ingest
    * re-admits the whole history).
    * Returns the number of residue rows removed.
    */
  def compact(spark: SparkSession, indexTable: String, buckets: Int = 16): Long = {
    ensureRegistered(spark, indexTable, buckets)
    if (!spark.catalog.tableExists(indexTable)) return 0L
    val before  = spark.table(indexTable).count()
    val staging = indexTable + "__compacting"
    spark.sql(s"DROP TABLE IF EXISTS `$staging`")
    deleteDir(dirPath(spark, staging))
    spark.table(indexTable)
      .groupBy("fp")
      .agg(min(coalesce(col("batch_key"), lit(""))).as("batch_key"))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "fp").sortBy("fp")
      .option("path", location(spark, staging))
      .format("parquet").saveAsTable(staging)
    spark.sql(s"DROP TABLE `$indexTable`") // external: catalog entry only
    spark.sql(s"DROP TABLE `$staging`")
    val retiring = dirPath(spark, indexTable + "__retiring")
    java.nio.file.Files.move(dirPath(spark, indexTable), retiring)
    java.nio.file.Files.move(dirPath(spark, staging), dirPath(spark, indexTable))
    deleteDir(retiring) // the old copy is discarded only after the swap
    spark.sql(createDdl(spark, indexTable, buckets))
    before - spark.table(indexTable).count()
  }

  /** The index's stable on-disk home under the warehouse dir. */
  private def location(spark: SparkSession, table: String): String =
    java.nio.file.Paths.get(
      java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir")).getPath)
      .resolve(table).toUri.toString

  private def dirPath(spark: SparkSession, table: String): java.nio.file.Path =
    java.nio.file.Paths.get(java.net.URI.create(location(spark, table)).getPath)

  private def deleteDir(loc: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(loc) // close: walk holds open dir fds
      val all  = try walk.iterator().asScala.toSeq.reverse finally walk.close()
      all.foreach(java.nio.file.Files.deleteIfExists(_))
    }

  private def dirNonEmpty(loc: java.nio.file.Path): Boolean =
    java.nio.file.Files.exists(loc) && {
      val ls = java.nio.file.Files.list(loc) // close: list holds an open dir fd
      try ls.findFirst().isPresent finally ls.close()
    }

  /** Finish or roll back a [[compact]] swap the JVM died inside: a
    * surviving `<table>__retiring` directory means the old index was
    * renamed aside — restore it if the live directory never materialized
    * (crash between the renames), otherwise just sweep the retired copy
    * (crash after the swap). Both directions preserve membership; a
    * stale `__compacting` staging dir is inert and re-cleared by the
    * next compact.
    */
  private def recoverSwap(spark: SparkSession, table: String): Unit = {
    val retiring = dirPath(spark, table + "__retiring")
    if (java.nio.file.Files.exists(retiring)) {
      val live = dirPath(spark, table)
      if (!java.nio.file.Files.exists(live))
        java.nio.file.Files.move(retiring, live)
      else deleteDir(retiring)
    }
  }

  private def createDdl(spark: SparkSession, table: String, buckets: Int): String =
    s"""CREATE TABLE `$table` (fp STRING, batch_key STRING) USING parquet
       |CLUSTERED BY (fp) SORTED BY (fp) INTO $buckets BUCKETS
       |LOCATION '${location(spark, table)}'""".stripMargin

  /** Re-attach an index whose files survived a catalog restart: if the
    * table is unknown to (this session's) catalog but its location holds
    * data, register it as the same external bucketed table rather than
    * letting a fresh create clobber the accumulated fingerprints. A
    * surviving catalog entry with the pre-batch_key 1-column schema is
    * upgraded in place (schema-only ALTER; legacy rows read batch_key =
    * NULL, which the null-safe exclusion keeps gating) — without this,
    * the 2-column append would fail at runtime against a legacy entry.
    */
  private def ensureRegistered(spark: SparkSession, table: String, buckets: Int): Unit = {
    recoverSwap(spark, table)
    if (!spark.catalog.tableExists(table)) {
      if (dirNonEmpty(dirPath(spark, table)))
        spark.sql(createDdl(spark, table, buckets))
    } else if (!spark.table(table).columns.contains("batch_key")) {
      spark.sql(s"ALTER TABLE `$table` ADD COLUMNS (batch_key STRING)")
    }
  }
}
