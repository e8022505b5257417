package graft.functions

import com.google.flatbuffers.FlatBufferBuilder

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import FlatBufferReader.{F144Value, Reader}

/** Scan-time decode operators (SURVEY §2.2, D1/D2): binary Kafka payload →
  * typed struct, as native Catalyst expressions so nested-field pruning
  * applies and no row-level Scala UDF boundary exists. Evaluation is
  * CodegenFallback (one virtual call per row over bytes already in memory);
  * the decode itself is allocation-light.
  *
  * Validity taxonomy mirrors `FlatbufferMessage.cpp:41-74`: BufferTooSmall,
  * UnknownFlatbufferID, NotValidFlatbuffer, ZeroTimestamp — invalid rows
  * yield `valid=false` + `error` instead of failing the task (F8: rejected
  * rows are counted, not fatal).
  */
object Decode {

  private val envelopeType = StructType(Seq(
    StructField("schema_id", StringType),
    StructField("source_name", StringType),
    StructField("timestamp", LongType),
    StructField("valid", BooleanType),
    StructField("error", StringType)
  ))

  /** D1 — schema dispatch + verify + metadata extraction (source_name and
    * the per-schema timestamp rule: ev44 = reference_time[0], tdct =
    * timestamps[0]).
    */
  case class DecodeEnvelope(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = envelopeType
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      def err(e: String) =
        InternalRow(null, null, null, false, UTF8String.fromString(e))
      if (bytes.length < 8) return err("BufferTooSmall")
      val r  = new Reader(bytes)
      val id = r.fileIdentifier
      try {
        val root = r.rootTable
        val (srcPos, ts) = id match {
          case "f144" | "al00" | "ad00" | "da00" =>
            (r.field(root, 0), at(r, root, tsFieldId = idTs(id)))
          case "ep01" =>
            (r.field(root, 0), at(r, root, 1))
          case "ev44" =>
            val rt = r.field(root, 2)
            (r.field(root, 0), if (rt < 0 || r.vectorLen(rt) == 0) 0L else r.i64Vector(rt)(0))
          case "tdct" =>
            val tv = r.field(root, 1)
            (r.field(root, 0), if (tv < 0 || r.vectorLen(tv) == 0) 0L else r.i64Vector(tv)(0))
          case _ => return err("UnknownFlatbufferID")
        }
        if (ts == 0L) return err("ZeroTimestamp")
        val src = if (srcPos < 0) null else UTF8String.fromString(r.string(srcPos))
        InternalRow(UTF8String.fromString(id), src, ts, true, null)
      } catch {
        case _: IndexOutOfBoundsException => err("NotValidFlatbuffer")
      }
    }
    private def idTs(id: String): Int = id match {
      case "f144" => 3 // source_name, value_type, value, timestamp
      case _      => 1 // source_name, timestamp, ...
    }
    private def at(r: Reader, root: Int, tsFieldId: Int): Long = {
      val p = r.field(root, tsFieldId)
      if (p < 0) 0L else r.i64(p)
    }
    override protected def withNewChildInternal(c: Expression): DecodeEnvelope = copy(c)
  }

  private val f144Type = StructType(Seq(
    StructField("source_name", StringType),
    StructField("timestamp", LongType),
    StructField("value", DoubleType)
  ))

  /** D2/W1 — f144 payload decode with the 10-way scalar union dispatch
    * (`f144_Writer.cpp:209-256`), widened to double.
    */
  case class DecodeF144(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = f144Type
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      if (bytes.length < 8 || new Reader(bytes).fileIdentifier != "f144") return null
      val r    = new Reader(bytes)
      val root = r.rootTable
      try {
        val src    = r.field(root, 0)
        val vtPos  = r.field(root, 1)
        val vPos   = r.field(root, 2)
        val tsPos  = r.field(root, 3)
        if (src < 0 || vtPos < 0 || vPos < 0) return null
        val vTable = r.indirect(vPos)
        val valPos = r.field(vTable, 0)
        if (valPos < 0) return null
        val v = (r.i8(vtPos).toInt: Int) match {
          case F144Value.Byte   => r.i8(valPos).toDouble
          case F144Value.UByte  => (r.i8(valPos) & 0xff).toDouble
          case F144Value.Short  => r.i16(valPos).toDouble
          case F144Value.UShort => (r.i16(valPos) & 0xffff).toDouble
          case F144Value.Int    => r.i32(valPos).toDouble
          case F144Value.UInt   => (r.i32(valPos) & 0xffffffffL).toDouble
          case F144Value.Long   => r.i64(valPos).toDouble
          case F144Value.ULong  => r.i64(valPos).toDouble
          case F144Value.Float  => r.f32(valPos).toDouble
          case F144Value.Double => r.f64(valPos)
          case _                => return null // array variants rejected (f144_Writer.cpp:249)
        }
        InternalRow(
          UTF8String.fromString(r.string(src)),
          if (tsPos < 0) 0L else r.i64(tsPos),
          v)
      } catch { case _: IndexOutOfBoundsException => null }
    }
    override protected def withNewChildInternal(c: Expression): DecodeF144 = copy(c)
  }

  private val ev44Type = StructType(Seq(
    StructField("source_name", StringType),
    StructField("reference_time", ArrayType(LongType)),
    StructField("reference_time_index", ArrayType(IntegerType)),
    StructField("time_of_flight", ArrayType(IntegerType)),
    StructField("pixel_id", ArrayType(IntegerType))
  ))

  /** ev44 payload decode: 4 parallel arrays (`ev44_Writer.cpp:98-136`).
    * Field ids: source_name, message_id, reference_time,
    * reference_time_index, time_of_flight, pixel_id.
    */
  case class DecodeEv44(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ev44Type
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      if (bytes.length < 8 || new Reader(bytes).fileIdentifier != "ev44") return null
      val r    = new Reader(bytes)
      val root = r.rootTable
      try {
        def longs(id: Int): ArrayData = {
          val p = r.field(root, id)
          new GenericArrayData(if (p < 0) Array.empty[Long] else r.i64Vector(p))
        }
        def ints(id: Int): ArrayData = {
          val p = r.field(root, id)
          new GenericArrayData(if (p < 0) Array.empty[Int] else r.i32Vector(p))
        }
        val src = r.field(root, 0)
        InternalRow(
          if (src < 0) null else UTF8String.fromString(r.string(src)),
          longs(2), ints(3), ints(4), ints(5))
      } catch { case _: IndexOutOfBoundsException => null }
    }
    override protected def withNewChildInternal(c: Expression): DecodeEv44 = copy(c)
  }

  // ---- column API ----------------------------------------------------
  // Spark 4 Column ↔ catalyst Expression bridge (classic mode)

  import org.apache.spark.sql.GraftBridge.{column, expression => toExpr}

  def decode_envelope(c: Column): Column = column(DecodeEnvelope(toExpr(c)))
  def decode_f144(c: Column): Column    = column(DecodeF144(toExpr(c)))
  def decode_ev44(c: Column): Column    = column(DecodeEv44(toExpr(c)))
}

/** Wire-format encoders for the same schemas — the test/fixture path
  * (the reference's `FlatBufferGenerators.h`), built on the public
  * flatbuffers-java runtime.
  */
object FbEncoders {

  /** f144 LogData with a Double value
    * (`FlatBufferGenerators.h:25-44`; ts here already ns).
    */
  def f144(source: String, tsNs: Long, value: Double): Array[Byte] = {
    val b      = new FlatBufferBuilder(128)
    val srcOff = b.createString(source)
    // value wrapper table Double { value: double } — field id 0
    b.startTable(1)
    b.addDouble(0, value, 0.0)
    val valOff = b.endTable()
    // f144_LogData { source_name, value_type, value, timestamp }
    b.startTable(4)
    b.addOffset(0, srcOff, 0)
    b.addByte(1, FlatBufferReader.F144Value.Double.toByte, 0)
    b.addOffset(2, valOff, 0)
    b.addLong(3, tsNs, 0L)
    val root = b.endTable()
    b.finish(root, "f144")
    b.sizedByteArray()
  }

  /** ev44 Event44Message (`FlatBufferGenerators.h:106-140`). */
  def ev44(
      source: String,
      referenceTime: Seq[Long],
      referenceTimeIndex: Seq[Int],
      timeOfFlight: Seq[Int],
      pixelId: Seq[Int]
  ): Array[Byte] = {
    val b      = new FlatBufferBuilder(256)
    val srcOff = b.createString(source)
    def i64Vec(xs: Seq[Long]): Int = {
      b.startVector(8, xs.length, 8)
      xs.reverse.foreach(b.addLong)
      b.endVector()
    }
    def i32Vec(xs: Seq[Int]): Int = {
      b.startVector(4, xs.length, 4)
      xs.reverse.foreach(b.addInt)
      b.endVector()
    }
    val rt  = i64Vec(referenceTime)
    val rti = i32Vec(referenceTimeIndex)
    val tof = i32Vec(timeOfFlight)
    val pix = i32Vec(pixelId)
    b.startTable(6)
    b.addOffset(0, srcOff, 0)
    b.addLong(1, 0L, 0L) // message_id
    b.addOffset(2, rt, 0)
    b.addOffset(3, rti, 0)
    b.addOffset(4, tof, 0)
    b.addOffset(5, pix, 0)
    val root = b.endTable()
    b.finish(root, "ev44")
    b.sizedByteArray()
  }
}
