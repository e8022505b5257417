package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  * Every expression implements `doGenCode` as ONE static call per row
  * (the `Decode.StaticCallCodegen` recipe), so the vector math sits
  * INSIDE whole-stage codegen — the per-row scoring loop of every
  * embed_* query stays a fused span instead of splitting at an
  * interpreted eval boundary. Matrix-parameterized expressions pass
  * their `double[][]` via `ctx.addReferenceObj` (resolved once, not per
  * row).
  *
  * Summation order is the same sequential left-to-right as the previous
  * fold expressions, so scores are bit-identical and oracle hashes stable.
  */
object VectorExpressions {

  // ---- static eval bodies (object has no companion class, so these get
  // true static forwarders the generated Java links directly) ----------

  def dotEval(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray(); val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0; var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  def l2Eval(a: ArrayData): Double = {
    val x = a.toDoubleArray()
    var s = 0.0; var i = 0
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    math.sqrt(s)
  }

  def centroidDistsEval(a: ArrayData, m: Array[Array[Double]]): ArrayData = {
    val v   = a.toDoubleArray()
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

  def nearestCentroidEval(a: ArrayData, m: Array[Array[Double]]): Int = {
    val v    = a.toDoubleArray()
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

  def matVecEval(a: ArrayData, m: Array[Array[Double]]): ArrayData = {
    val v   = a.toDoubleArray()
    val out = new Array[Double](m.length)
    var c = 0
    while (c < m.length) {
      val row = m(c)
      val n   = math.min(v.length, row.length)
      var s = 0.0; var i = 0
      while (i < n) { s += v(i) * row(i); i += 1 }
      out(c) = s
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Affine variant: the LAST row of `m` is a constant offset, so
    * out[c] = Σ v·m[c] − off[c] — one codegen call for y = V·x − b (the
    * centered-PCA rotation) with no per-element lambda.
    */
  def matVecAffineEval(a: ArrayData, m: Array[Array[Double]]): ArrayData = {
    val v   = a.toDoubleArray()
    val k   = m.length - 1
    val off = m(k)
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val row = m(c)
      val n   = math.min(v.length, row.length)
      var s = 0.0; var i = 0
      while (i < n) { s += v(i) * row(i); i += 1 }
      out(c) = s - off(c)
      c += 1
    }
    new GenericArrayData(out)
  }

  def rpSignatureEval(a: ArrayData, m: Array[Array[Double]]): Long = {
    val v   = a.toDoubleArray()
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

  private val Self = "graft.functions.VectorExpressions"

  /** Shared codegen shape for the matrix-parameterized unary expressions:
    * the matrix rides the references array, the row work is one static
    * call.
    */
  sealed trait MatrixCallCodegen extends UnaryExpression {
    protected def matrix: Array[Array[Double]]
    protected def staticMethod: String
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mRef = ctx.addReferenceObj("mat", matrix, "double[][]")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = $Self.$staticMethod($v, $mRef);")
    }
  }

  /** Σ aᵢ·bᵢ over two array<double> columns. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      dotEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $Self.dotEval($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(l, r)
  }

  /** √(Σ aᵢ²). */
  case class L2Norm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any = l2Eval(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $Self.l2Eval($a);")
    override protected def withNewChildInternal(c: Expression): L2Norm = copy(c)
  }

  /** Squared-L2 distance to every centroid of a literal k×d matrix. */
  case class CentroidDists(child: Expression, cents: Seq[Seq[Double]])
      extends MatrixCallCodegen {
    @transient private lazy val m: Array[Array[Double]] = cents.map(_.toArray).toArray
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    protected def matrix       = m
    protected def staticMethod = "centroidDistsEval"
    override def nullSafeEval(a: Any): Any =
      centroidDistsEval(a.asInstanceOf[ArrayData], m)
    override protected def withNewChildInternal(c: Expression): CentroidDists =
      copy(child = c)
  }

  /** Index of the nearest centroid (squared L2; ties → lowest index). */
  case class NearestCentroid(child: Expression, cents: Seq[Seq[Double]])
      extends MatrixCallCodegen {
    @transient private lazy val m: Array[Array[Double]] = cents.map(_.toArray).toArray
    override def dataType: DataType = IntegerType
    protected def matrix       = m
    protected def staticMethod = "nearestCentroidEval"
    override def nullSafeEval(a: Any): Any =
      nearestCentroidEval(a.asInstanceOf[ArrayData], m)
    override protected def withNewChildInternal(c: Expression): NearestCentroid =
      copy(child = c)
  }

  /** Random-hyperplane (SimHash) signature: bit i set when v·hᵢ ≥ 0 over
    * a literal plane matrix — ONE pass over the vector for all planes.
    * The sign-of-projection LSH family for cosine similarity (Charikar
    * STOC'02), the embedding-space analog of the text SimHash.
    */
  case class RpSignature(child: Expression, planes: Seq[Seq[Double]])
      extends MatrixCallCodegen {
    @transient private lazy val m: Array[Array[Double]] = planes.map(_.toArray).toArray
    override def dataType: DataType = LongType
    protected def matrix       = m
    protected def staticMethod = "rpSignatureEval"
    override def nullSafeEval(a: Any): Any =
      rpSignatureEval(a.asInstanceOf[ArrayData], m)
    override protected def withNewChildInternal(c: Expression): RpSignature =
      copy(child = c)
  }

  /** Literal-matrix × vector product: one pass over the vector for all k
    * rows (the PCA-projection kernel — k dot products without exploding
    * the corpus or leaving codegen).
    */
  case class MatVec(child: Expression, rows: Seq[Seq[Double]])
      extends MatrixCallCodegen {
    @transient private lazy val m: Array[Array[Double]] = rows.map(_.toArray).toArray
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    protected def matrix       = m
    protected def staticMethod = "matVecEval"
    override def nullSafeEval(a: Any): Any =
      matVecEval(a.asInstanceOf[ArrayData], m)
    override protected def withNewChildInternal(c: Expression): MatVec =
      copy(child = c)
  }

  /** Affine literal-matrix transform y = V·x − b in ONE codegen call
    * (the centered-PCA rotation kernel); `rows` carries V with b packed
    * as the final row.
    */
  case class MatVecAffine(child: Expression, rows: Seq[Seq[Double]])
      extends MatrixCallCodegen {
    @transient private lazy val m: Array[Array[Double]] = rows.map(_.toArray).toArray
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    protected def matrix       = m
    protected def staticMethod = "matVecAffineEval"
    override def nullSafeEval(a: Any): Any =
      matVecAffineEval(a.asInstanceOf[ArrayData], m)
    override protected def withNewChildInternal(c: Expression): MatVecAffine =
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
  def mat_vec(v: Column, rows: Seq[Seq[Double]]): Column =
    column(MatVec(toExpr(v), rows))
  def mat_vec_affine(v: Column, rows: Seq[Seq[Double]], offset: Seq[Double]): Column =
    column(MatVecAffine(toExpr(v), rows :+ offset))
}
