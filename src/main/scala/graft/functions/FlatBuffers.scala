package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Minimal FlatBuffers wire-format reader (little-endian, vtable-indirect) —
  * enough to decode the telemetry schemas without generated classes. Format
  * per the public FlatBuffers internals documentation; field ids follow the
  * ess streaming-data-types declaration order (see each decoder).
  *
  * The reference's validation counterpart is
  * `FileWriter::FlatbufferMessage::extractPacketInfo`
  * (`/root/reference/src/FlatbufferMessage.cpp:41-74`) with its
  * BufferTooSmall / UnknownFlatbufferID / NotValidFlatbuffer /
  * ZeroTimestamp error taxonomy.
  */
object FlatBufferReader {

  final class Reader(bytes: Array[Byte]) {
    val bb: ByteBuffer = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def size: Int = bytes.length

    def fileIdentifier: String =
      if (size < 8) "" else new String(bytes, 4, 4, StandardCharsets.UTF_8)

    /** absolute position of the root table. */
    def rootTable: Int = bb.getInt(0)

    /** absolute position of field `id` in table at `tablePos`, or -1. */
    def field(tablePos: Int, id: Int): Int = {
      val vtPos   = tablePos - bb.getInt(tablePos)
      val vtSize  = bb.getShort(vtPos) & 0xffff
      val slotOff = 4 + 2 * id
      if (slotOff + 2 > vtSize) return -1
      val off = bb.getShort(vtPos + slotOff) & 0xffff
      if (off == 0) -1 else tablePos + off
    }

    def i8(pos: Int): Byte    = bb.get(pos)
    def i16(pos: Int): Short  = bb.getShort(pos)
    def i32(pos: Int): Int    = bb.getInt(pos)
    def i64(pos: Int): Long   = bb.getLong(pos)
    def f32(pos: Int): Float  = bb.getFloat(pos)
    def f64(pos: Int): Double = bb.getDouble(pos)

    /** follow an offset field to its target (table / string / vector). */
    def indirect(pos: Int): Int = pos + bb.getInt(pos)

    /** Reject a vector whose claimed extent exceeds the buffer — corrupt
      * lengths must classify as NotValidFlatbuffer, not allocate.
      */
    private def checkedLen(n: Int, base: Int, elemSize: Int): Int = {
      if (n < 0 || base < 0 || base.toLong + n.toLong * elemSize > size)
        throw new IndexOutOfBoundsException("vector extent out of range")
      n
    }

    def string(pos: Int): String = {
      val p   = indirect(pos)
      val len = checkedLen(bb.getInt(p), p + 4, 1)
      new String(bytes, p + 4, len, StandardCharsets.UTF_8)
    }

    def vectorLen(pos: Int): Int  = bb.getInt(indirect(pos))
    def vectorBase(pos: Int): Int = indirect(pos) + 4

    def i32Vector(pos: Int): Array[Int] = {
      val base = vectorBase(pos); val n = checkedLen(vectorLen(pos), base, 4)
      Array.tabulate(n)(i => bb.getInt(base + 4 * i))
    }
    def i64Vector(pos: Int): Array[Long] = {
      val base = vectorBase(pos); val n = checkedLen(vectorLen(pos), base, 8)
      Array.tabulate(n)(i => bb.getLong(base + 8 * i))
    }

    /** vector of offsets (strings / tables): absolute element positions. */
    def offsetVector(pos: Int): Array[Int] = {
      val base = vectorBase(pos); val n = checkedLen(vectorLen(pos), base, 4)
      Array.tabulate(n)(i => base + 4 * i + bb.getInt(base + 4 * i))
    }
    def stringVector(pos: Int): Array[String] = {
      val base = vectorBase(pos); val n = checkedLen(vectorLen(pos), base, 4)
      Array.tabulate(n) { i =>
        val p   = base + 4 * i + bb.getInt(base + 4 * i)
        val len = checkedLen(bb.getInt(p), p + 4, 1)
        new String(bytes, p + 4, len, StandardCharsets.UTF_8)
      }
    }

    /** typed element vector widened to double, for the 10-way (+c_string)
      * scalar-array dispatch the se00/ad00/da00 writers share
      * (`se00_Writer.cpp:146-203`, `ad00_Writer.cpp:160-196`). `elemCode`
      * is a [[DTypes]] code; unsigned types are widened via masking
      * (u64 keeps the reference's native-bit-pattern caveat, SURVEY §1.2).
      */
    def elemVectorAsDouble(pos: Int, elemCode: Int, lengthInBytes: Boolean): Array[Double] = {
      val p    = indirect(pos)
      val base = p + 4
      val size = DTypes.byteSize(elemCode)
      // ad00/da00 raw [ubyte] payloads count BYTES; se00's typed vectors
      // count elements
      val n     = checkedLen(bb.getInt(p), base, if (lengthInBytes) 1 else size)
      val elems = if (lengthInBytes) n / size else n
      Array.tabulate(elems) { i =>
        val at = base + size * i
        elemCode match {
          case DTypes.Int8    => bb.get(at).toDouble
          case DTypes.UInt8   => (bb.get(at) & 0xff).toDouble
          case DTypes.Int16   => bb.getShort(at).toDouble
          case DTypes.UInt16  => (bb.getShort(at) & 0xffff).toDouble
          case DTypes.Int32   => bb.getInt(at).toDouble
          case DTypes.UInt32  => (bb.getInt(at) & 0xffffffffL).toDouble
          case DTypes.Int64   => bb.getLong(at).toDouble
          case DTypes.UInt64  => bb.getLong(at).toDouble
          case DTypes.Float32 => bb.getFloat(at).toDouble
          case DTypes.Float64 => bb.getDouble(at)
          case DTypes.CString => (bb.get(at) & 0xff).toDouble
          case _              => throw new IndexOutOfBoundsException("bad dtype")
        }
      }
    }
  }

  /** Canonical element-type codes shared by the ad00 `DType` and (shifted
    * by one for `none=0`) da00 `da00_dtype` enums, declaration order of the
    * public streaming-data-types schemas (dispatch mirrored from
    * `ad00_Writer.cpp:160-196`, `da00_Type.h:18-53`).
    */
  object DTypes {
    val Int8 = 0; val UInt8 = 1; val Int16 = 2; val UInt16 = 3
    val Int32 = 4; val UInt32 = 5; val Int64 = 6; val UInt64 = 7
    val Float32 = 8; val Float64 = 9; val CString = 10

    val names: Array[String] = Array("int8", "uint8", "int16", "uint16",
      "int32", "uint32", "int64", "uint64", "float32", "float64", "c_string")
    def name(code: Int): String =
      if (code >= 0 && code < names.length) names(code) else "unknown"
    def code(n: String): Int = names.indexOf(n)

    def byteSize(code: Int): Int = code match {
      case Int8 | UInt8 | CString => 1
      case Int16 | UInt16         => 2
      case Int32 | UInt32 | Float32 => 4
      case _                        => 8
    }
  }

  /** se00 ValueUnion member ids, declaration order of se00_data.fbs
    * (`se00_Writer.cpp:146-203` dispatch; NONE=0).
    */
  object Se00Value {
    val Int8Array = 1; val UInt8Array = 2; val Int16Array = 3
    val UInt16Array = 4; val Int32Array = 5; val UInt32Array = 6
    val Int64Array = 7; val UInt64Array = 8; val FloatArray = 9
    val DoubleArray = 10
    /** union member id → DTypes element code. */
    def elemCode(member: Int): Int = member - 1
  }

  /** f144 Value union member ids, declaration order of f144_logdata.fbs
    * (scalar members; the writer rejects array variants,
    * `f144_Writer.cpp:249-255`).
    */
  object F144Value {
    val Byte = 1; val UByte = 2; val Short = 3; val UShort = 4
    val Int = 5; val UInt = 6; val Long = 7; val ULong = 8
    val Float = 9; val Double = 10
  }
}
