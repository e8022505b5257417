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
  def indexed(
      df: DataFrame,
      orderCol: String,
      rowCol: String = "row",
      start: Long = 0L,
      weight: Option[(String, String, Long)] = None
  ): DataFrame = {
    val sorted = df
      .repartitionByRange(col(orderCol))
      .sortWithinPartitions(col(orderCol))
    val fields = sorted.schema.fields
    val wIdx   = weight.map { case (w, _, _) => fields.indexWhere(_.name == w) }
    wIdx.foreach(i => require(i >= 0, s"weight column not found"))

    val rdd = sorted.rdd
    // job 1: per-partition counts (+ weight sums) — O(numPartitions) longs
    val stats: Array[(Int, Long, Long)] = rdd
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

    val rowIdx = fields.indexWhere(_.name == rowCol)
    val baseFields =
      if (rowIdx >= 0) fields.updated(rowIdx, StructField(rowCol, LongType, nullable = false))
      else fields :+ StructField(rowCol, LongType, nullable = false)
    val outSchema = StructType(weight match {
      case Some((_, out, _)) => baseFields :+ StructField(out, LongType, nullable = false)
      case None              => baseFields
    })

    // job 2: stamp ids; reuses the job-1 shuffle output
    val stamped = rdd.mapPartitionsWithIndex { (pid, it) =>
      var rowAcc = rowOffsets(pid)
      var wAcc   = wOffsets(pid)
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
    df.sparkSession.createDataFrame(stamped, outSchema)
  }
}
