package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed order-preserving row numbering — the scale-safe replacement
  * for `row_number().over(Window.orderBy(...))`, which Spark evaluates by
  * moving the whole frame to ONE partition.
  *
  * Strategy (classic two-pass prefix sum):
  *   1. range-partition + sort on the order column (one shuffle, all
  *      partitions in parallel);
  *   2. job 1: per-partition (count, weight-sum) — a few longs to the driver;
  *   3. job 2: each partition stamps `start + partitionPrefix + localIndex`.
  * Both jobs share one RDD lineage, so the range-exchange map outputs are
  * computed once and reused — the sampled range boundaries cannot drift
  * between passes.
  *
  * The reference's appends are single-writer by design
  * (`/root/reference/src/Stream/MessageWriter.cpp:31-36`) but that
  * constrains the OUTPUT order, not the numbering computation: row ids are
  * pure arithmetic over (partition prefix, local position) and need no
  * single-partition stage. `orderCol` must be unique per row (Kafka offsets
  * and the modules' sparse sort keys are) for deterministic assignment.
  */
object Rows {

  /** Returns `df` with `rowCol` = consecutive ids `start, start+1, …` in
    * ascending `orderCol` order; replaces `rowCol` if it already exists
    * (it may equal `orderCol` — renumbering sparse sort keys in place).
    * Optionally also adds `weight = (weightCol, outCol, wStart)`: `outCol` =
    * `wStart` + exclusive running sum of `weightCol` in the same order (the
    * ev44 `EventsWritten` shift, `ev44_Writer.cpp:118-126`).
    *
    * Eager: runs the small stats job at call time; the returned frame's
    * final pass stays lazy and reuses the shuffle output.
    */
  /** Below this size (when the caller knows it) the global sort runs as
    * `coalesce(1)` + in-partition sort instead of a range exchange — one
    * task, and crucially NO RangePartitioner boundary sampling, which is
    * a whole extra job over the input. Profiled on the streaming
    * per-trigger path: sampling + 32-partition stats cost ~400 ms/trigger
    * at 1k-msg triggers for sub-millisecond work. The real budget of the
    * single task is BYTES (wide-array rows run ~16 KB — a rows-only bound
    * routed 160 MB triggers into one task, −16% at 20k-msg triggers), so
    * a byte hint, when the caller has one, both relaxes the row bound for
    * tiny rows and vetoes the small path for wide ones. Overridable via
    * spark.graft.rows.smallRenumber{,Bytes}.
    */
  private val SmallRenumberDefault      = 65536L
  private val SmallRenumberBytesDefault = 32L * 1024 * 1024

  def indexed(
      df: DataFrame,
      orderCol: String,
      rowCol: String = "row",
      start: Long = 0L,
      weight: Option[(String, String, Long)] = None,
      sizeHint: Long = -1L,
      byteHint: Long = -1L
  ): DataFrame =
    core(df, orderCol, rowCol, start, weight, sizeHint, byteHint,
      needCount = false)._1

  /** [[indexed]] plus the exact total row count — free, because the job-1
    * prefix-sum stats already hold it. Callers that would otherwise
    * `count()` the result (one more job over the same data) should use
    * this instead (the streaming write path does: the count gates
    * empty-table skips and sizes the append shaping).
    *
    * `sizeHint` is the caller's row-count estimate (exact or upper
    * bound), used ONLY to shape the exchange — small batches skip the
    * range sampling entirely, large ones size their partition count from
    * the hint (~256k rows each) instead of inheriting the session shuffle
    * width. Ids are exact regardless of hint quality.
    */
  def indexedCounted(
      df: DataFrame,
      orderCol: String,
      rowCol: String = "row",
      start: Long = 0L,
      weight: Option[(String, String, Long)] = None,
      sizeHint: Long = -1L,
      byteHint: Long = -1L
  ): (DataFrame, Long) =
    core(df, orderCol, rowCol, start, weight, sizeHint, byteHint,
      needCount = true)

  private def core(
      df: DataFrame,
      orderCol: String,
      rowCol: String,
      start: Long,
      weight: Option[(String, String, Long)],
      sizeHint: Long,
      byteHint: Long,
      needCount: Boolean
  ): (DataFrame, Long) = {
    val conf     = df.sparkSession.conf
    val rowsMax  = conf
      .get("spark.graft.rows.smallRenumber", SmallRenumberDefault.toString).toLong
    val bytesMax = conf
      .get("spark.graft.rows.smallRenumberBytes", SmallRenumberBytesDefault.toString).toLong
    // DRIVER fast path: a frame that is already a LocalRelation (buffered
    // flushes and the streaming fused-payload tiny-trigger path) numbers
    // on the driver with ZERO jobs — and, crucially, STAYS a
    // LocalRelation, so downstream flat module transforms keep folding
    // (ConvertToLocalRelation) all the way into the driver-side parquet
    // append. Probe the ANALYZED plan first (free — createDataFrame
    // frames analyze to a bare LocalRelation); pay an optimizer pass only
    // when the caller's hint says the frame could be small — on a big
    // distributed frame the result would be discarded driver work (the
    // same cost provablyEmpty gates in StreamingJob).
    type LR = org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val localRel: Option[LR] = df.queryExecution.analyzed match {
      case l: LR => Some(l)
      case _ if sizeHint < 0 || sizeHint <= rowsMax =>
        df.queryExecution.optimizedPlan match {
          case l: LR => Some(l)
          case _     => None
        }
      case _ => None
    }
    val localRows = localRel.map(_.data.size.toLong).getOrElse(-1L)
    val oField = df.schema.fields.find(_.name == orderCol)
    // gates: integral order column; within the small-renumber row bound
    // (a LARGE local frame should re-enter the distributed world here,
    // not anchor a driver-side pipeline); the wide-row byte veto applies
    // exactly as it does to the distributed small path — same conf keys
    if (localRows >= 0 && localRows <= rowsMax &&
      !(byteHint >= 0 && byteHint > bytesMax) &&
      oField.exists(f =>
        f.dataType == LongType || f.dataType == org.apache.spark.sql.types.IntegerType)) {
      val ext  = df.collect() // LocalTableScan executeCollect: no job
      val oIdx = df.schema.fieldIndex(orderCol)
      if (ext.forall(!_.isNullAt(oIdx))) {
        import scala.jdk.CollectionConverters._
        val fields = df.schema.fields
        val wIdx   = weight.map { case (w, _, _) => fields.indexWhere(_.name == w) }
        wIdx.foreach(i => require(i >= 0, s"weight column not found"))
        val (rowIdx, outSchema) = stampSchema(fields, rowCol, weight)
        val stampedRows = stampRows(
          ext.sortBy(_.getAs[Number](oIdx).longValue()).iterator,
          rowIdx, wIdx, start, weight.map(_._3).getOrElse(0L)).toSeq
        return (df.sparkSession.createDataFrame(stampedRows.asJava, outSchema),
          ext.length.toLong)
      }
    }
    // with a byte hint the byte bound decides (rows only guard sort CPU);
    // without one, the conservative row bound stands alone
    val small =
      if (byteHint >= 0) sizeHint >= 0 && sizeHint <= (1L << 20) && byteHint <= bytesMax
      else sizeHint >= 0 && sizeHint <= rowsMax
    val sorted =
      if (small)
        df.coalesce(1).sortWithinPartitions(col(orderCol))
      else if (sizeHint >= 0) {
        val width = conf.get("spark.sql.shuffle.partitions", "200").toInt
        val byRows  = (sizeHint + 262143) / 262144
        val byBytes = if (byteHint >= 0) (byteHint + (64L << 20) - 1) / (64L << 20) else 0L
        val parts = math.max(width, math.min(4096L, math.max(byRows, byBytes)).toInt)
        df.repartitionByRange(parts, col(orderCol)).sortWithinPartitions(col(orderCol))
      } else
        df.repartitionByRange(col(orderCol)).sortWithinPartitions(col(orderCol))
    val fields = sorted.schema.fields
    val wIdx   = weight.map { case (w, _, _) => fields.indexWhere(_.name == w) }
    wIdx.foreach(i => require(i >= 0, s"weight column not found"))

    val rdd = sorted.rdd
    // job 1: per-partition counts (+ weight sums) — O(numPartitions) longs.
    // A single-partition frame needs no prefix sums at all: partition 0
    // stamps from `start`/`wStart` directly, so when the caller doesn't
    // need the total either, the stats job is skipped entirely (the
    // streaming per-trigger path: one job saved per renumbered table).
    val stats: Array[(Int, Long, Long)] =
      if (small && !needCount) Array((0, -1L, -1L))
      else rdd
        .mapPartitionsWithIndex { (pid, it) =>
          var n = 0L; var w = 0L
          it.foreach { r =>
            n += 1
            wIdx.foreach(i => if (!r.isNullAt(i)) w += r.getAs[Number](i).longValue())
          }
          Iterator((pid, n, w))
        }
        .collect()
        .sortBy(_._1)
    val rowOffsets = new Array[Long](stats.length + 1)
    val wOffsets   = new Array[Long](stats.length + 1)
    rowOffsets(0) = start
    wOffsets(0) = weight.map(_._3).getOrElse(0L)
    stats.foreach { case (pid, n, w) =>
      rowOffsets(pid + 1) = rowOffsets(pid) + n
      wOffsets(pid + 1) = wOffsets(pid) + w
    }

    val (rowIdx, outSchema) = stampSchema(fields, rowCol, weight)

    // job 2: stamp ids; reuses the job-1 shuffle output
    val stamped = rdd.mapPartitionsWithIndex { (pid, it) =>
      stampRows(it, rowIdx, wIdx, rowOffsets(pid), wOffsets(pid))
    }
    val total =
      if (small && !needCount) -1L else rowOffsets(stats.length) - start
    (df.sparkSession.createDataFrame(stamped, outSchema), total)
  }

  /** Output schema shared by both numbering paths: `rowCol` becomes (or
    * joins as) a non-null long; the optional weight output appends.
    * Returns the pre-existing index of `rowCol` (−1 = appended).
    */
  private def stampSchema(
      fields: Array[StructField],
      rowCol: String,
      weight: Option[(String, String, Long)]
  ): (Int, StructType) = {
    val rowIdx = fields.indexWhere(_.name == rowCol)
    val baseFields =
      if (rowIdx >= 0) fields.updated(rowIdx, StructField(rowCol, LongType, nullable = false))
      else fields :+ StructField(rowCol, LongType, nullable = false)
    (rowIdx, StructType(weight match {
      case Some((_, out, _)) => baseFields :+ StructField(out, LongType, nullable = false)
      case None              => baseFields
    }))
  }

  /** One stamping pass over already-ordered rows: consecutive ids from
    * `rowStart`, exclusive weight prefix from `wStart` — THE single
    * definition the driver fast path and the distributed job-2 mapper
    * both use (a second copy could drift the two numbering paths).
    */
  private def stampRows(
      it: Iterator[Row],
      rowIdx: Int,
      wIdx: Option[Int],
      rowStart: Long,
      wStart: Long
  ): Iterator[Row] = {
    var rowAcc = rowStart
    var wAcc   = wStart
    it.map { r =>
      val base =
        if (rowIdx >= 0) r.toSeq.updated(rowIdx, rowAcc) else r.toSeq :+ rowAcc
      val out = wIdx match {
        case Some(i) =>
          val here = if (r.isNullAt(i)) 0L else r.getAs[Number](i).longValue()
          val withW = base :+ wAcc
          wAcc += here
          withW
        case None => base
      }
      rowAcc += 1
      Row.fromSeq(out)
    }
  }
}
