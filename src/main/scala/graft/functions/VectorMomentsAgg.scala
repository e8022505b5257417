package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** One-pass sufficient statistics over fixed-dimension vectors: the
  * buffer is `[n, Σx (d entries), Σx·xᵀ upper triangle (d(d+1)/2)]` — a
  * FIXED-size, mergeable state (d=64 ⇒ 2 145 doubles ≈ 17 KB) that
  * partial-aggregates map-side and crosses the shuffle exactly once,
  * whatever the corpus size. This is the covariance/PCA input shape for
  * 100 TB: no d²-row explode of the corpus, no per-pair shuffle — mean
  * and covariance both derive from this single pass
  * (cov(i,j) = Σxy/n − (Σxᵢ/n)(Σxⱼ/n)).
  *
  * Rows whose vector is null are ignored; a vector of the wrong length
  * fails fast (a ragged embedding column is corrupt input, not data).
  * Float elements widen to double before accumulation.
  */
case class VectorMomentsAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  require(d > 0, s"vector_moments: dimension must be positive, got $d")

  private val bufLen = 1 + d + d * (d + 1) / 2

  @transient private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean  = false

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    require(arr.numElements() == d,
      s"vector_moments: expected dimension $d, got ${arr.numElements()}")
    val x = new Array[Double](d)
    var i = 0
    while (i < d) {
      // a null ELEMENT would silently accumulate as 0.0 — corrupt input,
      // same policy as the wrong-length check above
      require(!arr.isNullAt(i),
        s"vector_moments: null element at index $i (corrupt vector)")
      x(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    buf(0) += 1.0
    i = 0
    var k = 1 + d
    while (i < d) {
      buf(1 + i) += x(i)
      var j = i
      while (j < d) {
        buf(k) += x(i) * x(j)
        k += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bufLen * 8)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val buf = new Array[Double](bufLen)
    ByteBuffer.wrap(bytes).asDoubleBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorMomentsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorMomentsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VectorMomentsAgg =
    copy(child = c)

  override def prettyName: String = "vector_moments"
}

object VectorMomentsAgg {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** Column API: `[n, Σx…, Σxxᵀ upper-tri…]` of a d-dim vector column. */
  def vector_moments(c: Column, d: Int): Column =
    column(VectorMomentsAgg(expression(c), d).toAggregateExpression())

  /** Upper-triangle offset of (i,j), i ≤ j, within the Σxy block. */
  def triIndex(d: Int, i: Int, j: Int): Int = i * d - i * (i - 1) / 2 + (j - i)
}
