package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chunk numbering for the chunk+stitch operators (chunked as-of join,
  * chunked prefix sum): assigns each row a `__pid` chunk id that is
  * (a) monotone non-decreasing in the lexicographic order of `rangeCols`
  * — so within any key, chunk order IS sort order and the stitch cascade
  * is exact — and (b) CONSISTENT across every consumer of the returned
  * frame — the id is read twice (local window + stitch frame joined back
  * on it), and an inconsistent numbering silently misaligns the stitch.
  *
  * Two interchangeable strategies, selected by the session conf
  * `spark.graft.chunkNumbering`:
  *
  *  - `checkpoint` (default): `repartitionByRange` + `spark_partition_id`,
  *    pinned with `localCheckpoint` so AQE cannot re-plan one consumer's
  *    read of the range exchange and renumber its partitions (observed:
  *    nondeterministic null fills before the pin). Zero extra jobs, but
  *    the checkpoint eagerly materializes the frame (a full extra pass at
  *    100 TB) and its blocks are non-recomputable — local-mode/bench-safe,
  *    not the numbering you want on a lossy 1000-executor cluster.
  *
  *  - `sampled`: an eager SLIM sampling pass (count + sample over
  *    `rangeCols` only — column-pruned at the scan) picks `chunks - 1`
  *    boundary tuples; the chunk id is then a pure expression of the row
  *    (count of boundaries ≤ the row's range key, evaluated as a codegen'd
  *    comparison chain over struct literals). Deterministic and
  *    recomputable — every re-read derives the same id from the data, so
  *    nothing needs pinning and lost blocks recompute fine. This is the
  *    cluster-scale strategy; the sampling pass costs two slim jobs.
  *
  * Both strategies satisfy (a) and (b); the stitch operators are
  * numbering-agnostic (equivalence pinned in `ChunkNumberingSpec`).
  */
object ChunkIds {

  /** Session conf key: `checkpoint` (default) | `sampled`. */
  val ConfKey = "spark.graft.chunkNumbering"

  /** Boundary-sample size multiplier: ~SampleFactor rows are drawn per
    * requested chunk, bounding the driver collect at chunks*SampleFactor
    * rows regardless of data volume.
    */
  private val SampleFactor = 32

  /** Adds `__pid` to `df` per the configured strategy. `rangeCols` is the
    * lexicographic (key…, order…) tuple the stitch order derives from.
    */
  def withChunkIds(df: DataFrame, rangeCols: Seq[Column], chunks: Int): DataFrame =
    df.sparkSession.conf.get(ConfKey, "checkpoint") match {
      case "sampled" => withSampledChunkIds(df, rangeCols, chunks)
      case _ =>
        df.repartitionByRange(chunks, rangeCols: _*)
          .withColumn("__pid", spark_partition_id())
          .localCheckpoint(false)
    }

  private def withSampledChunkIds(
      df: DataFrame, rangeCols: Seq[Column], chunks: Int): DataFrame = {
    val slim = df.select(rangeCols: _*)
    // Two slim jobs: count (to size the sample fraction), then a seeded
    // sample sorted IN SPARK (the tuple ordering lives in the engine, not
    // on the driver) and collected bounded. Boundary VALUES only affect
    // chunk balance, never correctness — any boundary set yields a
    // monotone, consistent numbering — so sampling error is benign.
    val n = slim.count()
    val target = (chunks.toLong * SampleFactor).toDouble
    val frac = if (n == 0) 0.0 else math.min(1.0, target / n)
    val sampleCols = slim.columns.toSeq
    val sample = slim.sample(withReplacement = false, frac, seed = 12061)
      .orderBy(sampleCols.map(col): _*)
      .collect()
    if (sample.length < 2 || chunks < 2) return df.withColumn("__pid", lit(0))
    // chunks-1 evenly spaced boundary rows; duplicates collapse (equal
    // boundaries would bucket identically — dropping them just merges
    // empty chunks)
    val step = sample.length.toDouble / chunks
    val boundaryRows = (1 until chunks)
      .map(i => sample(math.min(sample.length - 1, (i * step).toInt)))
      .distinct
    // field names and types must match EXACTLY on both comparison sides
    // (struct comparison is name- and type-sensitive); a sampled null
    // field would otherwise lit() as NullType and mismatch
    val fieldTypes = slim.schema.fields.map(_.dataType)
    val key = struct(rangeCols.zipWithIndex.map { case (c, i) => c.as(s"_c$i") }: _*)
    def boundaryLit(r: org.apache.spark.sql.Row): Column =
      struct(sampleCols.indices.map(i =>
        lit(r.get(i)).cast(fieldTypes(i)).as(s"_c$i")): _*)
    // __pid = #{boundaries <= key}: monotone in the range tuple (each
    // indicator is), identical for every re-evaluation (pure expression
    // over literals), and a null range field lands the row in chunk 0
    // consistently (null comparison -> otherwise-branch on every
    // indicator). O(chunks) codegen'd struct compares per row.
    val pid = boundaryRows
      .map(b => when(key >= boundaryLit(b), 1).otherwise(0))
      .reduce(_ + _)
    df.withColumn("__pid", pid)
  }
}
