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
  * `spark.graft.chunkNumbering` (default `auto`):
  *
  *  - `checkpoint`: `repartitionByRange` + `spark_partition_id`, pinned
  *    with a lineage cut so AQE cannot re-plan one consumer's read of the
  *    range exchange and renumber its partitions (observed:
  *    nondeterministic null fills before the pin). Zero extra jobs, but
  *    the pin eagerly materializes the frame (a full extra pass at
  *    100 TB) and a lost block is unrecoverable without a reliable
  *    checkpoint dir — local-mode/bench-appropriate.
  *
  *  - `sampled`: an eager SLIM sampling pass (count + sample over
  *    `rangeCols` only — column-pruned at the scan) picks `chunks - 1`
  *    boundary tuples; the chunk id is then a pure expression of the row
  *    (`#{boundaries <= key}`, binary search inside whole-stage codegen —
  *    [[graft.functions.BoundaryBucket]], O(log chunks) per row with
  *    constant generated-code size at ANY chunk count). Deterministic and
  *    recomputable — every re-read derives the same id from the data, so
  *    nothing needs pinning and lost blocks recompute fine. This is the
  *    cluster-scale strategy; the sampling pass costs two slim jobs
  *    (priced at sf10 in SCALE.md).
  *
  *  - `auto` (default): `sampled` on a non-local master (a real cluster
  *    loses executors; numbering must be recomputable), `checkpoint` on
  *    local masters (bench determinism, zero extra jobs) — so a cluster
  *    deployment gets the scale-safe numbering WITHOUT knowing the conf.
  *
  * All strategies satisfy (a) and (b); the stitch operators are
  * numbering-agnostic (equivalence pinned in `ChunkNumberingSpec`).
  */
object ChunkIds {

  /** Session conf key: `auto` (default) | `checkpoint` | `sampled`. */
  val ConfKey = "spark.graft.chunkNumbering"

  /** Boundary-sample size multiplier: ~SampleFactor rows are drawn per
    * requested chunk, bounding the driver collect at chunks*SampleFactor
    * rows regardless of data volume.
    */
  private val SampleFactor = 32

  /** The strategy `withChunkIds` will actually run under this session's
    * conf + master — `auto` resolved to its concrete choice. Exposed so
    * harness stamps record behavior, not the raw conf string (an explicit
    * `checkpoint` and a local-master `auto` behave identically and should
    * stamp identically; `auto` across different masters behaves
    * differently and should stamp differently).
    *
    * Only TRUE local masters (`local`, `local[...]`) resolve to
    * `checkpoint`: `local-cluster[...]` runs separate executor JVMs whose
    * `localCheckpoint` blocks can be lost — exactly the topology the
    * recomputable `sampled` strategy exists for.
    */
  def resolvedStrategy(spark: org.apache.spark.sql.SparkSession): String =
    spark.conf.get(ConfKey, "auto") match {
      case s @ ("sampled" | "checkpoint") => s
      case _ =>
        val m = spark.sparkContext.master
        if (m == "local" || m.startsWith("local[")) "checkpoint" else "sampled"
    }

  /** Adds `__pid` to `df` per the configured strategy. `rangeCols` is the
    * lexicographic (key…, order…) tuple the stitch order derives from.
    */
  def withChunkIds(df: DataFrame, rangeCols: Seq[Column], chunks: Int): DataFrame =
    resolvedStrategy(df.sparkSession) match {
      case "sampled" => withSampledChunkIds(df, rangeCols, chunks)
      case _         => withCheckpointChunkIds(df, rangeCols, chunks)
    }

  private def withCheckpointChunkIds(
      df: DataFrame, rangeCols: Seq[Column], chunks: Int): DataFrame =
    Reuse.lineageCut(
      df.repartitionByRange(chunks, rangeCols: _*)
        .withColumn("__pid", spark_partition_id()),
      eager = false)

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
    // External rows → InternalRows once on the driver; they ride the
    // BoundaryBucket expression as a reference object. The sample was
    // sorted by Spark under the same interpreted ordering the expression
    // compares with, so the array arrives sorted.
    val toInternal = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(slim.schema)
    val boundaries = boundaryRows
      .map(r => toInternal(r).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
      .toArray
    val key = struct(rangeCols.zipWithIndex.map { case (c, i) => c.as(s"_c$i") }: _*)
    // __pid = #{boundaries <= key}: monotone in the range tuple, identical
    // for every re-evaluation (pure function of row + literals), null
    // range fields ordered nulls-first (chunk 0 against non-null
    // boundaries). Binary search per row, constant codegen size.
    df.withColumn("__pid",
      graft.functions.BoundaryBucket.boundary_bucket(key, boundaries))
  }
}
