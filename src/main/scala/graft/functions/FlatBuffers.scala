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

    def string(pos: Int): String = {
      val p   = indirect(pos)
      val len = bb.getInt(p)
      new String(bytes, p + 4, len, StandardCharsets.UTF_8)
    }

    def vectorLen(pos: Int): Int  = bb.getInt(indirect(pos))
    def vectorBase(pos: Int): Int = indirect(pos) + 4

    def i32Vector(pos: Int): Array[Int] = {
      val base = vectorBase(pos); val n = vectorLen(pos)
      Array.tabulate(n)(i => bb.getInt(base + 4 * i))
    }
    def i64Vector(pos: Int): Array[Long] = {
      val base = vectorBase(pos); val n = vectorLen(pos)
      Array.tabulate(n)(i => bb.getLong(base + 8 * i))
    }
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
