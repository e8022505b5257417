package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout: interleave the bits of several
  * dimension columns into one sort key so that range-partitioning +
  * within-partition sort on the single z-value keeps EVERY dimension's
  * span small inside each file. Parquet min/max footer stats on the
  * dimension columns then prune scans filtered on ANY of the dims — the
  * standard write-side data-skipping layout for multi-dimension
  * predicates at 100 TB, where a single-column sort bounds only that one
  * column and leaves the others unclustered.
  *
  * The z-value is a closed-form codegen'd expression (shift/mask/sum —
  * no UDF); the layout is one `repartitionByRange` (sampled range
  * boundaries, the same mechanism as a global sort) + a local sort, so
  * the whole operation is a single shuffle regardless of dimension
  * count.
  */
object ZOrder {

  /** Morton code over the low `bits` bits of each dimension column
    * (non-negative integers; values ≥ 2^bits CLAMP to the top bucket
    * 2^bits−1, so out-of-range points stay at the far end of the curve
    * instead of aliasing onto small z-values and polluting distant
    * clusters' min/max stats). Earlier columns take the more-significant
    * interleaved positions. `bits * cols.size` must stay ≤ 62
    * (signed-long safe).
    */
  def zvalue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits > 0 && bits * cols.size <= 62,
      s"bits*dims must be in (0, 62], got $bits*${cols.size}")
    val n = cols.size
    val terms = for {
      b      <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(least(c.cast("long"), lit((1L << bits) - 1)), b)
        .bitwiseAND(lit(1L)),
      b * n + (n - 1 - i))
    terms.reduce(_ + _)
  }

  /** The same Morton code as a resolved Catalyst tree — for SQL
    * registration (`zorder_key`), where an injected function must return
    * real expressions, not DataFrame ColumnNodes.
    */
  def zvalueExpr(
      dims: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      bits: Int
  ): org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    require(dims.nonEmpty && bits > 0 && bits * dims.size <= 62,
      s"bits*dims must be in (0, 62], got $bits*${dims.size}")
    val n = dims.size
    val terms = for {
      b      <- 0 until bits
      (c, i) <- dims.zipWithIndex
    } yield ShiftLeft(
      BitwiseAnd(
        ShiftRight(
          Least(Seq(Cast(c, LongType), Literal((1L << bits) - 1))),
          Literal(b)),
        Literal(1L)),
      Literal(b * n + (n - 1 - i)))
    terms.reduceLeft[Expression](Add(_, _))
  }

  /** Cluster `df` for multi-dimension skipping: one range shuffle on the
    * z-value + a local sort. Write the result with per-file row-group
    * stats and scans filtered on any of `dims` prune most files.
    */
  def layout(df: DataFrame, dims: Seq[String], bits: Int, numPartitions: Int): DataFrame =
    df.withColumn("zval", zvalue(dims.map(col), bits))
      .repartitionByRange(numPartitions, col("zval"))
      .sortWithinPartitions("zval")
}
