package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Multi-consumer reuse pins with RECOMPUTABLE lineage.
  *
  * Many operators materialize an intermediate frame once because several
  * plan branches consume it (a shingle frame feeding a signature pass and
  * two verify joins; a per-key aggregate feeding both a max and the
  * equality join back). Through round 10 those pins were eager
  * `localCheckpoint`s — correct and bench-fast, but a localCheckpoint
  * block is NON-recomputable: its lineage is severed, so on a real
  * cluster one lost executor kills the job, and the eager materialization
  * is a full extra pass over a corpus-sized frame at 100 TB. None of
  * these sites *needs* severed lineage — the pinned frames are pure
  * deterministic transforms of source data (no sampling, no
  * `spark_partition_id`, no `rand`), so a recomputed block is identical
  * to the lost one.
  *
  * This helper replaces those pins with `persist(...)`: lineage stays
  * attached, lost blocks recompute from source, and nothing is eagerly
  * forced beyond the first consumer's own job. Two tiers:
  *
  *  - [[corpus]] — corpus-sized frames (shingle/gram arrays, embedding
  *    frames, per-doc feature counts): `DISK_ONLY` by default. At 100 TB
  *    a corpus-sized cache must not compete with execution memory; the
  *    serialized columnar batches land on local disk (page-cached at
  *    bench scale, spill-tier on a cluster) and evicted/lost blocks
  *    recompute.
  *  - [[slim]] — frames bounded by a KEY domain, not the corpus (per-
  *    suppkey aggregates, vocab tables, per-source profiles):
  *    `MEMORY_AND_DISK` — they fit, and re-reads are memory-speed.
  *
  * Storage for [[corpus]] is conf-overridable (`spark.graft.reuseStorage`
  * = `disk` | `memory` | `checkpoint`) so a deployment with memory to
  * spare can promote, and the pre-round-11 checkpoint behavior stays
  * reproducible for A/B measurement.
  *
  * [[lineageCut]] is the separate, SEMANTIC tool: iterative algorithms
  * (connected components, BPE merge rounds) must truncate a growing
  * lineage or round N re-evaluates rounds 0..N-1, and read-your-own-
  * writes barriers (incremental dedup's index append) must pin the result
  * because a recompute after the write would observe the write. Those
  * sites keep severed-lineage semantics — but on a cluster with a
  * reliable checkpoint dir configured (`sc.setCheckpointDir`), they
  * upgrade from executor-local blocks to replicated reliable checkpoints
  * automatically, which is the correct 1000-executor deployment shape.
  */
object Reuse {

  /** Session conf: storage behind [[corpus]] pins.
    * `disk` (default) | `memory` | `checkpoint`.
    */
  val ConfKey = "spark.graft.reuseStorage"

  /** Pin a corpus-sized frame for multiple consumers. Recomputable:
    * DISK_ONLY persist by default (see object doc). Lazy — the first
    * consumer materializes it; later consumers read blocks.
    */
  def corpus(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ConfKey, "disk") match {
      case "checkpoint" => df.localCheckpoint(true)
      case "memory"     => df.persist(StorageLevel.MEMORY_AND_DISK)
      case _            => df.persist(StorageLevel.DISK_ONLY)
    }

  /** Pin a key-domain-bounded (slim) frame for multiple consumers. */
  def slim(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ConfKey, "disk") match {
      case "checkpoint" => df.localCheckpoint(true)
      case _            => df.persist(StorageLevel.MEMORY_AND_DISK)
    }

  /** Severed-lineage pin for the two cases that NEED it (iteration
    * lineage truncation, read-your-own-writes barriers): reliable
    * `checkpoint` when the session has a checkpoint dir (cluster
    * deployment), executor-local `localCheckpoint` otherwise
    * (local/bench — no dir to write to).
    */
  def lineageCut(df: DataFrame, eager: Boolean = true): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(eager)
    else df.localCheckpoint(eager)
}
