package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 32-bit SimHash over whitespace tokens — one pass per document,
  * O(tokens) work, no row blowup.
  *
  * Bit-identical to the composable-builtins formulation in
  * `DocQueries.dedup_simhash` (explode tokens × explode 32 bits → two
  * shuffles and a tokens×32 row inflation): per token, the base hash is the
  * first 8 hex digits of md5 (the oracle-shared hash); bit b of the
  * signature is set when the majority of token hashes have bit b set.
  * The explode version exists for oracle parity documentation; THIS is the
  * form you run at 100 TB — the whole signature computes inside the scan
  * projection with zero shuffles, and `doGenCode` is one static call so
  * it stays inside whole-stage codegen.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash32.simhashEval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.SimHash32.simhashEval($s);")

  override protected def withNewChildInternal(c: Expression): SimHash32 = copy(c)
}

object SimHash32 {

  // one digest per task thread — getInstance per row would dominate the loop
  private val mdPool: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Static eval body (forwarded onto the companion class for codegen). */
  def simhashEval(input: UTF8String): Long = {
    val text   = input.toString
    val counts = new Array[Int](32)
    val md     = mdPool.get()
    var start  = 0
    val n      = text.length
    var i      = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        // token = text[start, i) — include empty tokens to match
        // split(text, ' ') semantics in the oracle formulation
        md.reset()
        val digest = md.digest(text.substring(start, i).getBytes("UTF-8"))
        // first 8 hex digits == first 4 bytes, big-endian hex string parse
        var h = 0L
        var b = 0
        while (b < 4) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
        var bit = 0
        while (bit < 32) {
          if (((h >> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 32) {
      if (counts(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  import org.apache.spark.sql.GraftBridge.{column, expression}
  def simhash32(c: Column): Column = column(SimHash32(expression(c)))
}
