package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** `#{boundaries <= key}` by BINARY SEARCH over a sorted boundary array —
  * the bucketing kernel behind sampled chunk numbering
  * ([[graft.operators.ChunkIds]]).
  *
  * The previous formulation unrolled one `when(key >= boundary_i, 1)`
  * struct comparison per boundary into the plan: O(chunks) generated
  * Java per row, which past a few hundred chunks blows the whole-stage
  * codegen method-size limit and silently drops the plan to interpreted
  * evaluation (ADVICE r10). Here the boundaries ride the expression as a
  * reference object (constant generated code size regardless of chunk
  * count) and each row pays O(log chunks) comparisons under Spark's own
  * interpreted row ordering — the SAME ordering `orderBy`/
  * `repartitionByRange` use, so bucket monotonicity in the range-tuple
  * order is exact, including null fields (nulls first).
  *
  * The monotone+consistent contract ([[graft.operators.ChunkIds]] doc) is
  * what the stitch operators need; boundary VALUES only affect balance.
  */
case class BoundaryBucket(child: Expression, boundaries: Array[InternalRow])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case st: StructType if st.fields.nonEmpty =>
        TypeUtils.checkForOrderingExpr(st, "boundary_bucket")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected a non-empty struct, got $other")
    }

  // Spark's interpreted ordering for the struct type: field-by-field,
  // nulls first — identical to the sort that produced the boundary sample
  @transient private lazy val ordering: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(child.dataType)
      .asInstanceOf[Ordering[InternalRow]]

  /** Count of boundaries <= key (binary search for the first boundary
    * strictly greater). Monotone in the range-tuple order and identical
    * on every re-evaluation — pure function of (row, boundary literals).
    */
  def bucketOf(key: InternalRow): Int = {
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordering.compare(boundaries(mid), key) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def nullSafeEval(input: Any): Any =
    bucketOf(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the whole expression rides the references array; generated code is
    // one virtual call — constant size, stays inside whole-stage codegen
    val ref = ctx.addReferenceObj("boundaryBucket", this,
      classOf[BoundaryBucket].getName)
    nullSafeCodeGen(ctx, ev, key => s"${ev.value} = $ref.bucketOf($key);")
  }

  override protected def withNewChildInternal(c: Expression): BoundaryBucket =
    copy(child = c)
}

object BoundaryBucket {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def boundary_bucket(key: Column, boundaries: Array[InternalRow]): Column =
    column(BoundaryBucket(expression(key), boundaries))
}
