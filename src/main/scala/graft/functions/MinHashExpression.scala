package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `numHashes` MinHash signature values of a shingle set in ONE pass:
  * per shingle, the base hash is the first 4 bytes of its md5 (exactly
  * `conv(substring(md5(x), 1, 8), 16, 10)` — the oracle-shared
  * construction in [[TextFunctions.shingleHashes]]), and each seed's
  * affine permutation `(a·h + b) mod p` updates a running minimum.
  *
  * Replaces numHashes interpreted `transform`+`array_min` passes (plus
  * the intermediate hash array) with a single evaluation that allocates
  * nothing per seed — the signature step of MinHash-LSH at corpus scale.
  * Arithmetic is identical to [[TextFunctions.minhash]], so DuckDB
  * reproduces every signature bit-for-bit.
  */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

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

  import TextFunctions.{minhashA, minhashB, MinhashP}
  private val as = (0 until numHashes).map(minhashA).toArray
  private val bs = (0 until numHashes).map(minhashB).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr  = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md   = MessageDigest.getInstance("MD5")
    var i    = 0
    while (i < arr.numElements()) {
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
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigs =
    copy(child = c)
}

object MinHashSigs {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def minhash_sigs(c: Column, numHashes: Int): Column =
    column(MinHashSigs(expression(c), numHashes))
}
