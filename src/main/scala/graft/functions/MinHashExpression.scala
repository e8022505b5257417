package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All `numHashes` MinHash signature values of a shingle set in ONE pass:
  * per shingle, the base hash is the first 4 bytes of its md5 (exactly
  * `conv(substring(md5(x), 1, 8), 16, 10)` — the oracle-shared
  * construction in [[TextFunctions.shingleHashes]]), and each seed's
  * affine permutation `(a·h + b) mod p` updates a running minimum.
  *
  * Replaces numHashes interpreted `transform`+`array_min` passes (plus
  * the intermediate hash array) with a single evaluation that allocates
  * nothing per seed — the signature step of MinHash-LSH at corpus scale.
  * `doGenCode` is one static call (seed arrays ride the references
  * array), so the signature pass stays inside whole-stage codegen.
  * Arithmetic is identical to [[TextFunctions.minhash]], so DuckDB
  * reproduces every signature bit-for-bit.
  */
case class MinHashSigs(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // an empty (or all-null-shingle) set has NO signature — the column form
  // this mirrors (`array_min` over zero hashed shingles) yields null, so
  // eval returns null rather than an array of Long.MaxValue sentinels
  // that would make all such documents spuriously identical
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected array<string>, got $other")
    }
  }

  import TextFunctions.{minhashA, minhashB}
  private val as = (0 until numHashes).map(minhashA).toArray
  private val bs = (0 until numHashes).map(minhashB).toArray

  override def nullSafeEval(input: Any): Any =
    MinHashSigs.sigsEval(input.asInstanceOf[ArrayData], as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"""${ev.value} = graft.functions.MinHashSigs.sigsEval($arr, $aRef, $bRef);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigs =
    copy(child = c)
}

object MinHashSigs {

  import TextFunctions.MinhashP

  // one digest per task thread — getInstance per row would dominate the loop
  private val mdPool: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Static eval body (forwarded onto the companion class, so generated
    * Java links it directly).
    */
  def sigsEval(arr: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val numHashes = as.length
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md   = mdPool.get()
    var hashed = false
    var i    = 0
    while (i < arr.numElements()) {
      // null shingles skip, matching the transform+array_min column form
      // (which maps null → null hash and array_min ignores it)
      if (arr.isNullAt(i)) { i += 1 }
      else {
      hashed = true
      val s = arr.getUTF8String(i)
      md.reset()
      val digest = md.digest(s.getBytes)
      // first 8 hex chars = first 4 digest bytes, big-endian unsigned
      val h = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
        ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
      var k = 0
      while (k < numHashes) {
        val p = (h * as(k) + bs(k)) % MinhashP
        if (p < mins(k)) mins(k) = p
        k += 1
      }
      i += 1
      }
    }
    // zero non-null shingles → no signature (null), never an array of
    // Long.MaxValue that would make all empty documents collide
    if (!hashed) null else new GenericArrayData(mins)
  }

  import org.apache.spark.sql.GraftBridge.{column, expression}
  def minhash_sigs(c: Column, numHashes: Int): Column =
    column(MinHashSigs(expression(c), numHashes))
}
