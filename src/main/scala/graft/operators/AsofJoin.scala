package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join: for every left row, the latest
  * right row with `right.ts <= left.ts` within the same key — the
  * time-series lookup the reference's cue index exists to serve
  * (timestamp→row binary search, SURVEY §2.7), expressed relationally.
  *
  * Implementation is the union + last-value-carry-forward pattern: tag both
  * sides, union, one shuffle on the key, one within-partition sort on
  * (ts, side), then `last(value, ignoreNulls)` over the preceding frame.
  * Cost: ONE shuffle of left+right — no range cross-product, no
  * per-row probe; at 1000 executors this is a plain repartition+sort.
  * Composing existing operators beats a custom SparkPlan here (preference
  * (a) of the custom-operator ladder).
  */
object AsofJoin {

  /** left (keyCols, tsCol, …) ⟕asof right (keyCols, tsCol, valueCols…).
    * Right-side columns arrive null when no right row precedes the left row.
    * Ties (equal ts) resolve to the right row (value visible at its own
    * timestamp), matching DuckDB/QuestDB ASOF semantics.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCols: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__side", lit(1))
      .select(Seq(col(tsCol), col("__side")) ++
        keyCols.map(col) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right
      .withColumn("__side", lit(0))
      .select(Seq(col(tsCol), col("__side")) ++
        keyCols.map(col) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(col): _*)
    // right rows sort before left rows at equal ts (side 0 < 1) so a value
    // is visible at its own timestamp
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(lTagged.unionByName(rTagged)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
  }

  /** As-of join keyed by time only (no equality key): same pattern with a
    * single global ordering — use when the right side is one stream.
    */
  def asofJoinGlobal(
      left: DataFrame,
      right: DataFrame,
      tsCol: String,
      valueCols: Seq[String]
  ): DataFrame = {
    val keyed = lit(0)
    asofJoin(left.withColumn("__k", keyed), right.withColumn("__k", keyed),
      Seq("__k"), tsCol, valueCols).drop("__k")
  }
}
