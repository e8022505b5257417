package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-key-safe per-key running sum (the prefix-sum primitive behind
  * token-budget sampling and sequence packing).
  *
  * The direct form — `sum(x).over(Window.partitionBy(key).orderBy(ord))` —
  * sorts EVERY row of a key in one task; with low-cardinality keys (a
  * language, a source shard) a single partition holds a macroscopic share
  * of a 100 TB corpus, and window partitions are never subdivided by AQE.
  * This is the textbook two-level scan instead:
  *
  *  1. range-partition on (key…, ord…) — a hot key spans many contiguous
  *     chunks, each a bounded local sort;
  *  2. per-chunk local running sum (window keyed by (chunk, key));
  *  3. per-(chunk, key) totals — ONE row per chunk and key, ≤ #partitions
  *     rows per key regardless of data volume — get an exclusive running
  *     sum over chunks (the tiny stitch window), giving each chunk its
  *     carry-in offset;
  *  4. offsets join back on (chunk, key) and shift the local sums. The
  *     join carries NO broadcast hint: the stitch frame is small per KEY
  *     but holds one row per (chunk, key) — with 10⁸ distinct keys a
  *     forced broadcast is a driver OOM. AQE broadcasts it at runtime
  *     when it measures small and shuffles it otherwise (the big side
  *     is re-shuffling onto (chunk, key…) for the window anyway).
  *
  * Within a key, partition id is monotone in ord (range partitioning on
  * the lexicographic key), so chunk order IS ord order and the offsets are
  * exact. Restricted to integral `value` types: a double running sum has
  * summation-order semantics this re-grouping would change; the LLM
  * pipeline's prefix sums are token COUNTS (longs).
  */
object PrefixSum {

  /** Adds `outCol` = the per-`keyCols` running sum of `valueCol` in
    * `orderCols` order over `df`, EXCLUSIVE of the current row (the
    * cum-before form both call sites want; add the row's own value back
    * for the inclusive form). `chunks` sizes the range partitioning.
    */
  def runningSumExclusive(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      outCol: String,
      chunks: Int
  ): DataFrame = {
    require({
      import org.apache.spark.sql.types._
      Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(df.schema(valueCol).dataType)
    }, s"$valueCol: chunked running sum re-groups additions — integral types only")
    val rangeKeys: Seq[Column] = (keyCols ++ orderCols).map(col)
    // chunk numbering is strategy-pluggable (ChunkIds; default `auto` =
    // checkpoint on local masters, sampled on clusters): `checkpoint`
    // pins a range exchange's partition ids with a lineage cut so the
    // TWO consumers of __pid (local sums and the offsets frame joined
    // back on it) cannot be renumbered by an AQE re-plan; `sampled`
    // derives __pid from sampled boundaries via a binary-search
    // expression — recomputable, no materialization, the cluster-scale
    // strategy.
    val parted = ChunkIds.withChunkIds(df, rangeKeys, chunks)
    val wLocal = Window
      .partitionBy((col("__pid") +: keyCols.map(col)): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn(outCol,
      coalesce(sum(col(valueCol)).over(wLocal), lit(0L)))
    // stitch frame: chunk totals per key, exclusive-cascaded over chunks
    val wStitch = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted
      .groupBy((col("__pid") +: keyCols.map(col)): _*)
      .agg(sum(col(valueCol)).as("__chunk_total"))
      .withColumn("__carry_in",
        coalesce(sum(col("__chunk_total")).over(wStitch), lit(0L)))
      .select(Seq(col("__pid").as("__opid")) ++
        keyCols.map(k => col(k).as(s"__ok_$k")) :+ col("__carry_in"): _*)
    // NULL-SAFE key equality: the single-window form groups a null key
    // into its own partition (Window.partitionBy groups nulls), so the
    // stitch must carry across its chunks too — a plain USING equi-join
    // never matches null keys, losing the carry AND (being inner)
    // dropping the null-key rows from the output entirely
    val joinCond = keyCols.foldLeft(col("__pid") === col("__opid")) {
      (acc, k) => acc && (col(k) <=> col(s"__ok_$k"))
    }
    local.join(offsets, joinCond)
      .withColumn(outCol, col(outCol) + col("__carry_in"))
      .drop(Seq("__pid", "__opid", "__carry_in") ++
        keyCols.map(k => s"__ok_$k"): _*)
  }
}
