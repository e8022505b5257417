package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded top-k aggregate: keeps the k SMALLEST values of the child
  * (any orderable type — put a descending key first in a struct to get
  * "largest") per group, returning them as a sorted array.
  *
  * This is the scale-correct replacement for the
  * `row_number().over(Window.partitionBy(g).orderBy(o)) <= k` idiom:
  * the window form SORTS every group's full row set (and buffers it
  * around the sort), while this aggregate carries at most 2k values per
  * group through the map-side partial, the shuffle, and the merge —
  * memory O(k) per group, no per-group sort of the unbounded input, and
  * the rows that survive are the only ones that ever leave the map side.
  *
  * Follows the serialization pattern of Spark's own
  * `collect_list` (TypedImperativeAggregate + one-column UnsafeProjection
  * of the buffer array) — public Spark source, reimplemented for a
  * bounded buffer.
  */
case class TopKStructs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
    with UnaryLike[Expression] {

  require(k > 0, s"top_k_structs: k must be positive, got $k")

  /** Fail at ANALYSIS for unorderable inputs (maps): without this the
    * interpreted-ordering lookup throws mid-task instead.
    */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_structs: input type ${child.dataType.sql} is not orderable")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean  = false

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  /** Append, compacting back to k whenever the scratch space doubles —
    * amortized O(log k) per row without a heap allocation per update.
    */
  private def add(buf: mutable.ArrayBuffer[Any], v: Any): mutable.ArrayBuffer[Any] = {
    buf += v
    if (buf.length >= 2 * k) compact(buf) else buf
  }

  private def compact(buf: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val kept = buf.sorted(ordering).take(k)
    buf.clear()
    buf ++= kept
  }

  override def update(
      buf: mutable.ArrayBuffer[Any],
      input: InternalRow): mutable.ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v == null) buf else add(buf, InternalRow.copyValue(v))
  }

  override def merge(
      buf: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    buf ++= other
    compact(buf)
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.sorted(ordering).take(k).toArray)

  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType, containsNull = false)))
  @transient private lazy val row = new UnsafeRow(1)

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val buf = mutable.ArrayBuffer.empty[Any]
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, x: Any) => buf += x)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKStructs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKStructs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TopKStructs =
    copy(child = c)

  override def prettyName: String = "top_k_structs"
}

object TopKStructs {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** Column API: smallest k child values per group as a sorted array. */
  def top_k_structs(c: Column, k: Int): Column =
    column(TopKStructs(expression(c), k).toAggregateExpression())
}
