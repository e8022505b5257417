package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** One-pass ANCHORED sufficient statistics over fixed-dimension vectors:
  * the buffer is `[n, a (d anchor entries), Σu (d entries),
  * Σu·uᵀ upper triangle (d(d+1)/2)]` where `u = x − a` and `a` is the
  * first vector each partial buffer sees — a FIXED-size, mergeable state
  * (d=64 ⇒ 2 209 doubles ≈ 17.7 KB) that partial-aggregates map-side and
  * crosses the shuffle exactly once, whatever the corpus size.
  *
  * WHY the anchor: the raw-moment identity cov = Σxy/n − (Σx/n)(Σy/n)
  * subtracts two O(μ²) terms to recover an O(σ²) result — catastrophic
  * cancellation whenever |μ| ≫ σ (the round-6 `embed_covariance` hash
  * miss landed exactly on such a 6-dp rounding boundary). Anchoring at a
  * data point makes every accumulated term O(x−a) ≈ O(σ), so
  * cov = Σuv/n − (Σu/n)(Σv/n) subtracts terms of the RESULT's own
  * magnitude. Buffers anchored at different points merge exactly via the
  * standard shift identity (Chan–Golub–LeVeque pairwise update):
  * with δ = a_other − a_target,
  * Σ(u+δᵢ)(v+δⱼ) = Σuv + δᵢΣv + δⱼΣu + n·δᵢδⱼ.
  *
  * Consumers never index the buffer directly — [[VectorMomentsAgg.count]],
  * [[VectorMomentsAgg.mean]] and [[graft.operators.Pca.covariance]] own
  * the layout.
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

  private val bufLen = VectorMomentsAgg.bufferLength(d)

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
    if (buf(0) == 0.0) {
      // first row of this partial buffer becomes its anchor; its own
      // centered contribution is exactly zero
      i = 0
      while (i < d) { buf(1 + i) = x(i); i += 1 }
      buf(0) = 1.0
      return buf
    }
    buf(0) += 1.0
    val u = new Array[Double](d)
    i = 0
    while (i < d) { u(i) = x(i) - buf(1 + i); i += 1 }
    i = 0
    var k = 1 + 2 * d
    while (i < d) {
      buf(1 + d + i) += u(i)
      var j = i
      while (j < d) {
        buf(k) += u(i) * u(j)
        k += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    val no = other(0)
    if (no == 0.0) return buf
    if (buf(0) == 0.0) {
      System.arraycopy(other, 0, buf, 0, bufLen)
      return buf
    }
    // shift `other`'s anchored sums onto buf's anchor: δ = a_o − a_b
    val delta = new Array[Double](d)
    var i = 0
    while (i < d) { delta(i) = other(1 + i) - buf(1 + i); i += 1 }
    buf(0) += no
    i = 0
    var k = 1 + 2 * d
    while (i < d) {
      var j = i
      while (j < d) {
        buf(k) += other(k) + delta(i) * other(1 + d + j) +
          delta(j) * other(1 + d + i) + no * delta(i) * delta(j)
        k += 1
        j += 1
      }
      i += 1
    }
    i = 0
    while (i < d) {
      buf(1 + d + i) += other(1 + d + i) + no * delta(i)
      i += 1
    }
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

  /** Column API: anchored moments buffer of a d-dim vector column —
    * consume via [[count]] / [[mean]] / [[graft.operators.Pca.covariance]].
    */
  def vector_moments(c: Column, d: Int): Column =
    column(VectorMomentsAgg(expression(c), d).toAggregateExpression())

  /** Buffer length for dimension d: `[n, a(d), Σu(d), Σuuᵀ(tri)]`. */
  def bufferLength(d: Int): Int = 1 + 2 * d + d * (d + 1) / 2

  /** Row count accumulated into a moments buffer. */
  def count(m: Array[Double]): Double = m(0)

  /** Mean vector from a moments buffer: μ = a + Σu/n. */
  def mean(m: Array[Double], d: Int): Array[Double] = {
    require(m(0) > 0, "mean of an empty corpus")
    Array.tabulate(d)(i => m(1 + i) + m(1 + d + i) / m(0))
  }

  /** Upper-triangle offset of (i,j), i ≤ j, within the Σuv block. */
  def triIndex(d: Int, i: Int, j: Int): Int = i * d - i * (i - 1) / 2 + (j - i)

  /** Start offset of the Σuuᵀ upper-triangle block. */
  def triBase(d: Int): Int = 1 + 2 * d
}
