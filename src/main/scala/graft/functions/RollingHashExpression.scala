package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint via a Rabin–Karp rolling hash over UTF-8 bytes —
  * one pass, order-sensitive (unlike md5-of-normalized-text it
  * distinguishes permutations cheaply and supports incremental extension).
  * Base 257, modulus 2^61−1 (Mersenne, reduction via shift-add); the same
  * construction as content-defined chunking hashes.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  private val Mod  = (1L << 61) - 1
  private val Base = 257L

  private def mulMod(a: Long, b: Long): Long = {
    // 128-bit multiply-reduce via Math.multiplyHigh (Java 9+)
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 2^64·hi + lo mod 2^61−1:  2^64 ≡ 8 (mod 2^61−1)
    val folded = (lo & Mod) + (lo >>> 61) + ((hi << 3) & Mod) + (hi >>> 58)
    var r = folded
    while (r >= Mod) r -= Mod
    r
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h     = 0L
    var i     = 0
    while (i < bytes.length) {
      h = mulMod(h, Base) + (bytes(i) & 0xff)
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }

  override protected def withNewChildInternal(c: Expression): RollingHash = copy(c)
}

object RollingHash {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def rolling_hash(c: Column): Column = column(RollingHash(expression(c)))
}
