package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native vector math for the embedding/ANN operators. Spark's
  * higher-order functions (`zip_with` + `aggregate`) evaluate INTERPRETED
  * — per-element lambda dispatch with boxing — and the unrolled
  * per-centroid alternative compiles k large expression trees (measured
  * seconds of codegen at k=8). These expressions are tight primitive
  * loops over `ArrayData` with the centroid matrix baked in as a plan
  * literal (a few KB — the "broadcast centroid matrix" pattern), giving
  * both fast eval AND trivial compile.
  *
  * Summation order is the same sequential left-to-right as the previous
  * fold expressions, so scores are bit-identical and oracle hashes stable.
  */
object VectorExpressions {

  private def toDoubles(a: Any): Array[Double] =
    a.asInstanceOf[ArrayData].toDoubleArray()

  /** Σ aᵢ·bᵢ over two array<double> columns. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = toDoubles(a); val y = toDoubles(b)
      val n = math.min(x.length, y.length)
      var s = 0.0; var i = 0
      while (i < n) { s += x(i) * y(i); i += 1 }
      s
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(l, r)
  }

  /** √(Σ aᵢ²). */
  case class L2Norm(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any = {
      val x = toDoubles(a)
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i) * x(i); i += 1 }
      math.sqrt(s)
    }
    override protected def withNewChildInternal(c: Expression): L2Norm = copy(c)
  }

  /** Squared-L2 distance to every centroid of a literal k×d matrix. */
  case class CentroidDists(child: Expression, cents: Seq[Seq[Double]])
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val m: Array[Array[Double]] = cents.map(_.toArray).toArray
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(a: Any): Any = {
      val v   = toDoubles(a)
      val out = new Array[Double](m.length)
      var c = 0
      while (c < m.length) {
        val cent = m(c)
        val n    = math.min(v.length, cent.length)
        var s = 0.0; var i = 0
        while (i < n) { val d = v(i) - cent(i); s += d * d; i += 1 }
        out(c) = s
        c += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): CentroidDists =
      copy(child = c)
  }

  /** Index of the nearest centroid (squared L2; ties → lowest index). */
  case class NearestCentroid(child: Expression, cents: Seq[Seq[Double]])
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val m: Array[Array[Double]] = cents.map(_.toArray).toArray
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any): Any = {
      val v    = toDoubles(a)
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < m.length) {
        val cent = m(c)
        val n    = math.min(v.length, cent.length)
        var s = 0.0; var i = 0
        while (i < n) { val d = v(i) - cent(i); s += d * d; i += 1 }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      best
    }
    override protected def withNewChildInternal(c: Expression): NearestCentroid =
      copy(child = c)
  }

  /** Random-hyperplane (SimHash) signature: bit i set when v·hᵢ ≥ 0 over
    * a literal plane matrix — ONE pass over the vector for all planes.
    * The sign-of-projection LSH family for cosine similarity (Charikar
    * STOC'02), the embedding-space analog of the text SimHash.
    */
  case class RpSignature(child: Expression, planes: Seq[Seq[Double]])
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val m: Array[Array[Double]] = planes.map(_.toArray).toArray
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any): Any = {
      val v   = toDoubles(a)
      var sig = 0L
      var p = 0
      while (p < m.length) {
        val h = m(p)
        val n = math.min(v.length, h.length)
        var s = 0.0; var i = 0
        while (i < n) { s += v(i) * h(i); i += 1 }
        if (s >= 0) sig |= (1L << p)
        p += 1
      }
      sig
    }
    override protected def withNewChildInternal(c: Expression): RpSignature =
      copy(child = c)
  }

  /** Deterministic dyadic-rational hyperplanes: component (i,j) is
    * ((i·dim+j)·2654435761 + 12345 mod 1024 − 512) / 512 — exact integer
    * arithmetic then division by a power of two, so ANY engine (the
    * DuckDB oracle included) reproduces the doubles bit-for-bit, unlike
    * seeded Gaussians.
    */
  def dyadicPlanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map(i => (0 until dim).map { j =>
      val k = (i.toLong * dim + j) * 2654435761L + 12345L
      ((k % 1024L) - 512L).toDouble / 512.0
    })

  // ---- column API ----------------------------------------------------

  import org.apache.spark.sql.GraftBridge.{column, expression => toExpr}

  def dot_product(a: Column, b: Column): Column = column(DotProduct(toExpr(a), toExpr(b)))
  def l2_norm(a: Column): Column                = column(L2Norm(toExpr(a)))
  def centroid_dists(v: Column, cents: Seq[Seq[Double]]): Column =
    column(CentroidDists(toExpr(v), cents))
  def nearest_centroid(v: Column, cents: Seq[Seq[Double]]): Column =
    column(NearestCentroid(toExpr(v), cents))
  def rp_signature(v: Column, planes: Seq[Seq[Double]]): Column =
    column(RpSignature(toExpr(v), planes))
}
