package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match points to `[lo, hi]` intervals. With an
  * equality key Spark already handles this well (hash join on the key,
  * range as residual filter); the hard case is the PURE range join — no
  * equality key — which naively degenerates to a broadcast-nested-loop
  * cross product.
  *
  * The scale fix is banding: bucket both sides by `bandWidth` (intervals
  * explode over every band they overlap), equi-join on the band id, then
  * apply the exact range predicate. Cost: a hash shuffle on the band key,
  * with interval duplication bounded by `ceil(len/bandWidth)+1` — choose
  * bandWidth near the typical interval length.
  */
object RangeJoin {

  /** points(ptCol) ⋈ intervals[loCol, hiCol], banded. Inclusive bounds. */
  def bandedRangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      ptCol: String,
      loCol: String,
      hiCol: String,
      bandWidth: Long
  ): DataFrame = {
    val p = points.withColumn("__band", (col(ptCol) / bandWidth).cast("long"))
    val i = intervals.withColumn(
      "__band",
      explode(sequence((col(loCol) / bandWidth).cast("long"),
        (col(hiCol) / bandWidth).cast("long"))))
    p.join(i, Seq("__band"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__band")
  }
}
