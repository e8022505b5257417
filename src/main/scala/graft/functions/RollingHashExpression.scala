package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared Rabin–Karp modular arithmetic: base 257 over bytes, modulus
  * 2^61−1 (Mersenne, reduction via shift-add) — the same construction as
  * content-defined chunking hashes. This object (no companion class →
  * true static forwarders) also hosts the static eval bodies the
  * generated code calls, so every rolling-hash expression participates
  * in whole-stage codegen — these sit under the substring-dedup and
  * LM-filter query group, the heaviest text path.
  */
object RollingMod {
  val Mod: Long  = (1L << 61) - 1
  val Base: Long = 257L

  def mulMod(a: Long, b: Long): Long = {
    // 128-bit multiply-reduce via Math.multiplyHigh (Java 9+)
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 2^64·hi + lo mod 2^61−1:  2^64 ≡ 8 (mod 2^61−1)
    val folded = (lo & Mod) + (lo >>> 61) + ((hi << 3) & Mod) + (hi >>> 58)
    var r = folded
    while (r >= Mod) r -= Mod
    r
  }

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = mulMod(h, Base) + (bytes(i) & 0xff)
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }

  /** [[RollingHash]] eval body. */
  def rollingHashEval(s: UTF8String): Long = hashBytes(s.getBytes)

  /** [[WindowPolyHash]] eval body: `topW` = B^(width−1) mod M precomputed
    * at plan time.
    */
  def windowPolyEval(input: ArrayData, width: Int, topW: Long): ArrayData = {
    val B = WindowPolyHash.WindowBase
    // null element hashes (a null token) have NO defined gram hash: a
    // window covering one emits null (the transform-form semantics) —
    // toLongArray would unbox null to 0 and silently corrupt the gram
    val m = input.numElements()
    var hasNull = false
    var c = 0
    while (c < m && !hasNull) { hasNull = input.isNullAt(c); c += 1 }
    if (hasNull) {
      val n = m - width + 1
      if (n <= 0) return new GenericArrayData(Array.empty[Long])
      val out = new Array[Any](n)
      var j = 0
      while (j < n) { // rare path: only null-containing rows pay O(n·w)
        var ok = true
        var h  = 0L
        var k  = j
        while (k < j + width && ok) {
          if (input.isNullAt(k)) ok = false
          else { h = mulMod(h, B) + input.getLong(k); if (h >= Mod) h -= Mod }
          k += 1
        }
        out(j) = if (ok) java.lang.Long.valueOf(h) else null
        j += 1
      }
      return new GenericArrayData(out)
    }
    val xs = input.toLongArray()
    val n  = xs.length - width + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n)
    var h   = 0L
    var i   = 0
    while (i < width) { // first window: plain fold
      h = mulMod(h, B) + xs(i)
      if (h >= Mod) h -= Mod
      i += 1
    }
    out(0) = h
    var j = 1
    while (j < n) { // roll: drop xs(j-1), add xs(j+width-1)
      val dropped = mulMod(xs(j - 1), topW)
      h = h - dropped
      if (h < 0) h += Mod
      h = mulMod(h, B) + xs(j + width - 1)
      if (h >= Mod) h -= Mod
      out(j) = h
      j += 1
    }
    new GenericArrayData(out)
  }

  /** [[TokenHashes]] eval body. Null elements hash to null (the contract
    * of the `transform(tk, t => rolling_hash(t))` form this replaces);
    * the null-free fast path stays a primitive long array.
    */
  def tokenHashesEval(arr: ArrayData): ArrayData = {
    val n       = arr.numElements()
    var hasNull = false
    var i       = 0
    while (i < n && !hasNull) { hasNull = arr.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Long](n)
      i = 0
      while (i < n) { out(i) = hashBytes(arr.getUTF8String(i).getBytes); i += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) = if (arr.isNullAt(i)) null else hashBytes(arr.getUTF8String(i).getBytes)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** [[CharGramCodes]] eval body. */
  def charGramEval(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val count = bytes.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Long])
    val out  = new Array[Long](count)
    val mask = (1L << (8 * n)) - 1
    var code = 0L
    var i    = 0
    while (i < n - 1) { code = (code << 8) | (bytes(i) & 0xffL); i += 1 }
    while (i < bytes.length) {
      code = ((code << 8) | (bytes(i) & 0xffL)) & mask
      out(i - n + 1) = code
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Document fingerprint via a Rabin–Karp rolling hash over UTF-8 bytes —
  * one pass, order-sensitive (unlike md5-of-normalized-text it
  * distinguishes permutations cheaply and supports incremental extension).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    RollingMod.rollingHashEval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.RollingMod.rollingHashEval($s);")

  override protected def withNewChildInternal(c: Expression): RollingHash = copy(c)
}

/** Rolling hash of EVERY element of an array<string> in one native pass
  * — replaces the `transform(tk, t => rolling_hash(t))` higher-order
  * form, which evaluates interpreted (per-element lambda dispatch) and
  * drags the whole projection out of whole-stage codegen. Feeds
  * [[WindowPolyHash]] in the substring-dedup gram pipeline.
  */
case class TokenHashes(child: Expression) extends UnaryExpression {

  // null elements pass through as null hashes — mirror the input's
  // nullability so a null-free tokenizer output keeps the tight schema
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, cn) => ArrayType(LongType, containsNull = cn)
    case _                => ArrayType(LongType, containsNull = true)
  }

  override def nullSafeEval(input: Any): Any =
    RollingMod.tokenHashesEval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.RollingMod.tokenHashesEval($arr);")

  override protected def withNewChildInternal(c: Expression): TokenHashes =
    copy(c)
}

object TokenHashes {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def token_hashes(c: Column): Column = column(TokenHashes(expression(c)))
}

/** Sliding-window polynomial hash over a precomputed Array[Long] of
  * element hashes: output i (0-based) is the base-`WindowBase` polynomial
  * of elements [i, i+width) mod 2^61−1 — i.e. the hash every `w`-token
  * gram of a document, computed in ONE O(n) pass via the rolling update
  * G' = (G − x_out·B^(w−1))·B + x_in instead of O(n·w) per-window folds.
  * The gram-table primitive of substring-level dedup (the public
  * shingle-span approach; cf. the reference's windowed stream processing,
  * `src/Stream/MessageWriter.cpp` being per-message one-pass in the same
  * spirit).
  */
case class WindowPolyHash(child: Expression, width: Int) extends UnaryExpression {

  require(width >= 1, s"window width must be >= 1, got $width")

  // a window covering a null element hash emits a null gram (eval body),
  // so the element nullability must mirror the child's — declaring
  // containsNull=false here would let codegen elide null checks and read
  // the null slot as gram 0, colliding every null-covering window
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, cn) => ArrayType(LongType, containsNull = cn)
    case _                => ArrayType(LongType, containsNull = true)
  }

  import RollingMod.mulMod
  // B^(width-1) mod M — the weight of the outgoing element
  private val topW: Long =
    (1 until width).foldLeft(1L)((acc, _) => mulMod(acc, WindowPolyHash.WindowBase))

  override def nullSafeEval(input: Any): Any =
    RollingMod.windowPolyEval(input.asInstanceOf[ArrayData], width, topW)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs =>
      s"${ev.value} = graft.functions.RollingMod.windowPolyEval($xs, $width, ${topW}L);")

  override protected def withNewChildInternal(c: Expression): WindowPolyHash =
    copy(child = c)
}

/** All character `n`-gram codes of a string in ONE pass over its UTF-8
  * bytes: code i = big-endian packing of bytes [i, i+n) — for n=3,
  * `(b₀ << 16) | (b₁ << 8) | b₂`. Injective for n ≤ 7, so grouping by
  * code ≡ grouping by gram string, with 8-byte shuffle keys instead of
  * string allocations (the LM-filter gram primitive; on an ASCII corpus
  * the oracle reproduces codes as `ord(substr)·256^k` arithmetic).
  */
case class CharGramCodes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1 && n <= 7, s"gram width must be in [1,7], got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    RollingMod.charGramEval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.RollingMod.charGramEval($s, $n);")

  override protected def withNewChildInternal(c: Expression): CharGramCodes =
    copy(child = c)
}

object RollingHash {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def rolling_hash(c: Column): Column = column(RollingHash(expression(c)))
}

object CharGramCodes {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def char_gram_codes(c: Column, n: Int): Column =
    column(CharGramCodes(expression(c), n))
}

object WindowPolyHash {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** Token-level base — distinct from the byte-level base so a gram hash
    * is never confusable with a byte hash of the concatenation.
    */
  val WindowBase: Long = 1000003L

  def window_poly_hash(c: Column, width: Int): Column =
    column(WindowPolyHash(expression(c), width))
}
