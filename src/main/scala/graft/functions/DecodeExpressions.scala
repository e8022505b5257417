package graft.functions

import com.google.flatbuffers.FlatBufferBuilder

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import FlatBufferReader.{DTypes, F144Value, Reader, Se00Value}

/** Scan-time decode operators (SURVEY §2.2, D1/D2): binary Kafka payload →
  * typed struct, as native Catalyst expressions so nested-field pruning
  * applies and no row-level Scala UDF boundary exists. Each expression
  * implements `doGenCode` as a direct static call to its decoder body, so
  * the decode PARTICIPATES in whole-stage codegen — the scan-time loop
  * every ingested byte passes through stays one fused span with no
  * interpreted `eval` boundary and no per-row boxing (a CodegenFallback
  * here would split the WholeStageCodegen span at the hottest operator).
  *
  * Validity taxonomy mirrors `FlatbufferMessage.cpp:41-74`: BufferTooSmall,
  * UnknownFlatbufferID, NotValidFlatbuffer, ZeroTimestamp — invalid rows
  * yield `valid=false` + `error` instead of failing the task (F8: rejected
  * rows are counted, not fatal).
  */
object Decode {

  /** Shared `doGenCode` shape: one static call per row on the non-null
    * path (`Decode` has no companion class, so the Scala object methods
    * get true static forwarders Janino can link). `nullableResult`
    * decoders return null on foreign/invalid payloads.
    */
  sealed trait StaticCallCodegen extends UnaryExpression {
    protected def staticMethod: String
    protected def nullableResult: Boolean
    override def nullable: Boolean = child.nullable || nullableResult
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val call = s"${ev.value} = graft.functions.Decode.$staticMethod($bytes);"
        if (nullableResult) s"$call\n${ev.isNull} = ${ev.value} == null;" else call
      })
  }

  private val envelopeType = StructType(Seq(
    StructField("schema_id", StringType),
    StructField("source_name", StringType),
    StructField("timestamp", LongType),
    StructField("valid", BooleanType),
    StructField("error", StringType)
  ))

  /** D1 eval body — static so generated code calls it directly. */
  def envelopeEval(bytes: Array[Byte]): InternalRow = {
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
        case "se00" =>
          // name=0, packet_timestamp=6 (se00_Extractor.cpp:31-39)
          (r.field(root, 0), at(r, root, 6))
        case "ev44" =>
          // element 0 only — i64Vector would copy the WHOLE reference_time
          // array per message just to read its head (same below for tdct's
          // chopper timestamps); bounds violations on corrupt input still
          // land in the NotValidFlatbuffer catch
          val rt = r.field(root, 2)
          (r.field(root, 0),
            if (rt < 0 || r.vectorLen(rt) == 0) 0L else r.i64(r.vectorBase(rt)))
        case "tdct" =>
          val tv = r.field(root, 1)
          (r.field(root, 0),
            if (tv < 0 || r.vectorLen(tv) == 0) 0L else r.i64(r.vectorBase(tv)))
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

  /** D1 — schema dispatch + verify + metadata extraction (source_name and
    * the per-schema timestamp rule: ev44 = reference_time[0], tdct =
    * timestamps[0]).
    */
  case class DecodeEnvelope(child: Expression) extends StaticCallCodegen {
    override def dataType: DataType = envelopeType
    protected def staticMethod   = "envelopeEval"
    protected def nullableResult = false // every input yields a row (maybe an error row)
    override def nullSafeEval(input: Any): Any =
      envelopeEval(input.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): DecodeEnvelope = copy(c)
  }

  private val f144Type = StructType(Seq(
    StructField("source_name", StringType),
    StructField("timestamp", LongType),
    StructField("value", DoubleType)
  ))

  /** f144 eval body — static for the generated call. */
  def f144Eval(bytes: Array[Byte]): InternalRow = {
    if (bytes.length < 8) return null
    val r = new Reader(bytes) // ONE reader per row (the sibling decoders' form)
    if (r.fileIdentifier != "f144") return null
    val root = r.rootTable
    try {
      val src    = r.field(root, 0)
      val vtPos  = r.field(root, 1)
      val vPos   = r.field(root, 2)
      val tsPos  = r.field(root, 3)
      if (src < 0 || vtPos < 0 || vPos < 0) return null
      val vTable = r.indirect(vPos)
      val valPos = r.field(vTable, 0)
      // a scalar equal to the schema default (0) is ELIDED by conforming
      // FlatBuffers builders: the vtable slot is absent and the accessor
      // contract is "return the default", not "reject" — the reference
      // reads through generated accessors that do exactly that. Only the
      // declared TYPE decides validity; a missing value field is 0.
      // (Found by the sf0.1 gate: six events with value = 0.0 decoded to
      // null rows under the old `valPos < 0 => reject`.)
      val v = (r.i8(vtPos).toInt: Int) match {
        case F144Value.Byte   => if (valPos < 0) 0.0 else r.i8(valPos).toDouble
        case F144Value.UByte  => if (valPos < 0) 0.0 else (r.i8(valPos) & 0xff).toDouble
        case F144Value.Short  => if (valPos < 0) 0.0 else r.i16(valPos).toDouble
        case F144Value.UShort => if (valPos < 0) 0.0 else (r.i16(valPos) & 0xffff).toDouble
        case F144Value.Int    => if (valPos < 0) 0.0 else r.i32(valPos).toDouble
        case F144Value.UInt   => if (valPos < 0) 0.0 else (r.i32(valPos) & 0xffffffffL).toDouble
        case F144Value.Long   => if (valPos < 0) 0.0 else r.i64(valPos).toDouble
        case F144Value.ULong  => if (valPos < 0) 0.0 else r.i64(valPos).toDouble
        case F144Value.Float  => if (valPos < 0) 0.0 else r.f32(valPos).toDouble
        case F144Value.Double => if (valPos < 0) 0.0 else r.f64(valPos)
        case _                => return null // array variants rejected (f144_Writer.cpp:249)
      }
      InternalRow(
        UTF8String.fromString(r.string(src)),
        if (tsPos < 0) 0L else r.i64(tsPos),
        v)
    } catch { case _: IndexOutOfBoundsException => null }
  }

  /** D2/W1 — f144 payload decode with the 10-way scalar union dispatch
    * (`f144_Writer.cpp:209-256`), widened to double.
    */
  case class DecodeF144(child: Expression) extends StaticCallCodegen {
    override def dataType: DataType = f144Type
    protected def staticMethod   = "f144Eval"
    protected def nullableResult = true
    override def nullSafeEval(input: Any): Any =
      f144Eval(input.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): DecodeF144 = copy(c)
  }

  private val ev44Type = StructType(Seq(
    StructField("source_name", StringType),
    StructField("reference_time", ArrayType(LongType)),
    StructField("reference_time_index", ArrayType(IntegerType)),
    StructField("time_of_flight", ArrayType(IntegerType)),
    StructField("pixel_id", ArrayType(IntegerType))
  ))

  /** ev44 eval body — static for the generated call. */
  def ev44Eval(bytes: Array[Byte]): InternalRow = {
    if (bytes.length < 8) return null
    val r = new Reader(bytes) // ONE reader per row (the sibling decoders' form)
    if (r.fileIdentifier != "ev44") return null
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

  /** ev44 payload decode: 4 parallel arrays (`ev44_Writer.cpp:98-136`).
    * Field ids: source_name, message_id, reference_time,
    * reference_time_index, time_of_flight, pixel_id.
    */
  case class DecodeEv44(child: Expression) extends StaticCallCodegen {
    override def dataType: DataType = ev44Type
    protected def staticMethod   = "ev44Eval"
    protected def nullableResult = true
    override def nullSafeEval(input: Any): Any =
      ev44Eval(input.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): DecodeEv44 = copy(c)
  }

  private val al00Type = StructType(Seq(
    StructField("source_name", StringType),
    StructField("timestamp", LongType),
    StructField("severity", ShortType),
    StructField("message", StringType)
  ))

  /** al00 Alarm payload: (source_name, timestamp, severity→i16, message)
    * (`al00_Writer.cpp:57-70`). Field ids: source_name=0, timestamp=1,
    * severity=2 (short enum), message=3.
    */
  /** al00 eval body — static for the generated call. */
  def al00Eval(bytes: Array[Byte]): InternalRow = {
    if (bytes.length < 8) return null
    val r = new Reader(bytes)
    if (r.fileIdentifier != "al00") return null
    try {
      val root = r.rootTable
      val src  = r.field(root, 0)
      val tsP  = r.field(root, 1)
      val sevP = r.field(root, 2)
      val msgP = r.field(root, 3)
      InternalRow(
        if (src < 0) null else UTF8String.fromString(r.string(src)),
        if (tsP < 0) 0L else r.i64(tsP),
        if (sevP < 0) 0.toShort else r.i16(sevP),
        if (msgP < 0) UTF8String.fromString("")
        else UTF8String.fromString(r.string(msgP)))
    } catch { case _: IndexOutOfBoundsException => null }
  }

  case class DecodeAl00(child: Expression) extends StaticCallCodegen {
    override def dataType: DataType = al00Type
    protected def staticMethod   = "al00Eval"
    protected def nullableResult = true
    override def nullSafeEval(input: Any): Any =
      al00Eval(input.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): DecodeAl00 = copy(c)
  }

  private val ep01Type = StructType(Seq(
    StructField("source_name", StringType),
    StructField("timestamp", LongType),
    StructField("status", ShortType)
  ))

  /** ep01 EpicsPVConnectionInfo payload: (source_name, timestamp,
    * status→i16) (`ep01_Writer.cpp:38-46`). Field ids: source_name=0,
    * timestamp=1, status=2 (short enum).
    */
  /** ep01 eval body — static for the generated call. */
  def ep01Eval(bytes: Array[Byte]): InternalRow = {
    if (bytes.length < 8) return null
    val r = new Reader(bytes)
    if (r.fileIdentifier != "ep01") return null
    try {
      val root = r.rootTable
      val src  = r.field(root, 0)
      val tsP  = r.field(root, 1)
      val stP  = r.field(root, 2)
      InternalRow(
        if (src < 0) null else UTF8String.fromString(r.string(src)),
        if (tsP < 0) 0L else r.i64(tsP),
        if (stP < 0) 0.toShort else r.i16(stP))
    } catch { case _: IndexOutOfBoundsException => null }
  }

  case class DecodeEp01(child: Expression) extends StaticCallCodegen {
    override def dataType: DataType = ep01Type
    protected def staticMethod   = "ep01Eval"
    protected def nullableResult = true
    override def nullSafeEval(input: Any): Any =
      ep01Eval(input.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): DecodeEp01 = copy(c)
  }

  private val tdctType = StructType(Seq(
    StructField("source_name", StringType),
    StructField("timestamps", ArrayType(LongType)),
    StructField("sequence_counter", LongType)
  ))

  /** tdct chopper-TDC payload: (name, timestamps u64[], sequence_counter)
    * (`tdct_Writer.cpp:67-83`). Field ids: name=0, timestamps=1,
    * sequence_counter=2 (u32). u64 timestamps keep their bit patterns in
    * LongType (SURVEY §1.2 wrap caveat, as the reference writes natively).
    */
  /** tdct eval body — static for the generated call. */
  def tdctEval(bytes: Array[Byte]): InternalRow = {
    if (bytes.length < 8) return null
    val r = new Reader(bytes)
    if (r.fileIdentifier != "tdct") return null
    try {
      val root = r.rootTable
      val src  = r.field(root, 0)
      val tsV  = r.field(root, 1)
      val seqP = r.field(root, 2)
      InternalRow(
        if (src < 0) null else UTF8String.fromString(r.string(src)),
        new GenericArrayData(
          if (tsV < 0) Array.empty[Long] else r.i64Vector(tsV)),
        if (seqP < 0) 0L else r.i32(seqP) & 0xffffffffL)
    } catch { case _: IndexOutOfBoundsException => null }
  }

  case class DecodeTdct(child: Expression) extends StaticCallCodegen {
    override def dataType: DataType = tdctType
    protected def staticMethod   = "tdctEval"
    protected def nullableResult = true
    override def nullSafeEval(input: Any): Any =
      tdctEval(input.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): DecodeTdct = copy(c)
  }

  private val se00Type = StructType(Seq(
    StructField("source_name", StringType),
    StructField("channel", IntegerType),
    StructField("time_delta", DoubleType),
    StructField("timestamps", ArrayType(LongType), nullable = true),
    StructField("message_counter", LongType),
    StructField("packet_timestamp", LongType),
    StructField("values_type", StringType),
    StructField("values", ArrayType(DoubleType))
  ))

  /** se00 sample-environment payload with the 10-way array-union dispatch
    * widened to double (`se00_Writer.cpp:135-224`). Field ids: name=0,
    * channel=1, time_delta=2, timestamp_location=3, timestamps=4,
    * message_counter=5, packet_timestamp=6, values_type=7, values=8
    * (union member table holds the typed vector at field 0). An absent
    * timestamps vector decodes to null — the writer then generates
    * `packet_timestamp + i·Δ` (se00_Writer.cpp:209-219).
    */
  /** se00 eval body — static for the generated call. */
  def se00Eval(bytes: Array[Byte]): InternalRow = {
    if (bytes.length < 8) return null
    val r = new Reader(bytes)
    if (r.fileIdentifier != "se00") return null
    try {
      val root = r.rootTable
      val src  = r.field(root, 0)
      val chP  = r.field(root, 1)
      val dtP  = r.field(root, 2)
      val tsV  = r.field(root, 4)
      val mcP  = r.field(root, 5)
      val ptP  = r.field(root, 6)
      val vtP  = r.field(root, 7)
      val valP = r.field(root, 8)
      val member = if (vtP < 0) 0 else r.i8(vtP).toInt
      val values =
        if (valP < 0 || member < Se00Value.Int8Array ||
          member > Se00Value.DoubleArray) Array.empty[Double]
        else {
          val memberTable = r.indirect(valP)
          val vecP        = r.field(memberTable, 0)
          if (vecP < 0) Array.empty[Double]
          else r.elemVectorAsDouble(vecP,
            Se00Value.elemCode(member), lengthInBytes = false)
        }
      InternalRow(
        if (src < 0) null else UTF8String.fromString(r.string(src)),
        if (chP < 0) 0 else r.i32(chP),
        if (dtP < 0) 0.0 else r.f64(dtP),
        if (tsV < 0) null else new GenericArrayData(r.i64Vector(tsV)),
        if (mcP < 0) 0L else r.i64(mcP),
        if (ptP < 0) 0L else r.i64(ptP),
        UTF8String.fromString(
          if (member < 1 || member > 10) "none"
          else DTypes.name(Se00Value.elemCode(member))),
        new GenericArrayData(values))
    } catch { case _: IndexOutOfBoundsException => null }
  }

  case class DecodeSe00(child: Expression) extends StaticCallCodegen {
    override def dataType: DataType = se00Type
    protected def staticMethod   = "se00Eval"
    protected def nullableResult = true
    override def nullSafeEval(input: Any): Any =
      se00Eval(input.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): DecodeSe00 = copy(c)
  }

  private val ad00Type = StructType(Seq(
    StructField("source_name", StringType),
    StructField("timestamp", LongType),
    StructField("dimensions", ArrayType(LongType)),
    StructField("data_type", StringType),
    StructField("data", ArrayType(DoubleType))
  ))

  /** ad00 n-D detector-image payload: raw `[ubyte]` data reinterpreted per
    * the DType enum, widened to double; shape from `dimensions`
    * (`ad00_Writer.cpp:142-204`). Field ids: source_name=0, timestamp=1,
    * dimensions=2, data_type=3, data=4 (attributes=5 ignored, as the
    * writer does). c_string data decodes to per-char byte values (the
    * reference appends a char array).
    */
  /** ad00 eval body — static for the generated call. */
  def ad00Eval(bytes: Array[Byte]): InternalRow = {
    if (bytes.length < 8) return null
    val r = new Reader(bytes)
    if (r.fileIdentifier != "ad00") return null
    try {
      val root = r.rootTable
      val src  = r.field(root, 0)
      val tsP  = r.field(root, 1)
      val dimV = r.field(root, 2)
      val dtP  = r.field(root, 3)
      val datV = r.field(root, 4)
      val code = if (dtP < 0) DTypes.Int8 else r.i8(dtP).toInt
      InternalRow(
        if (src < 0) null else UTF8String.fromString(r.string(src)),
        if (tsP < 0) 0L else r.i64(tsP),
        new GenericArrayData(
          if (dimV < 0) Array.empty[Long] else r.i64Vector(dimV)),
        UTF8String.fromString(DTypes.name(code)),
        new GenericArrayData(
          if (datV < 0) Array.empty[Double]
          else r.elemVectorAsDouble(datV, code, lengthInBytes = true)))
    } catch { case _: IndexOutOfBoundsException => null }
  }

  case class DecodeAd00(child: Expression) extends StaticCallCodegen {
    override def dataType: DataType = ad00Type
    protected def staticMethod   = "ad00Eval"
    protected def nullableResult = true
    override def nullSafeEval(input: Any): Any =
      ad00Eval(input.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): DecodeAd00 = copy(c)
  }

  private val da00VarType = StructType(Seq(
    StructField("name", StringType),
    StructField("unit", StringType),
    StructField("label", StringType),
    StructField("axes", ArrayType(StringType)),
    StructField("shape", ArrayType(LongType)),
    StructField("data_type", StringType),
    StructField("data", ArrayType(DoubleType))
  ))
  private val da00Type = StructType(Seq(
    StructField("source_name", StringType),
    StructField("timestamp", LongType),
    StructField("data", ArrayType(da00VarType))
  ))

  /** da00 multi-variable DataArray payload (`da00_Writer.cpp:333-387`).
    * DataArray field ids: source_name=0, timestamp=1, data=2 ([Variable]);
    * Variable field ids: name=0, unit=1, label=2, source=3, data_type=4
    * (da00_dtype, none=0 ⇒ element codes shifted by one vs ad00),
    * axes=5, shape=6, data=7 (raw [ubyte], reinterpreted + widened like
    * ad00; `da00_Type.h:18-53`).
    */
  /** da00 eval body — static for the generated call. */
  def da00Eval(bytes: Array[Byte]): InternalRow = {
    if (bytes.length < 8) return null
    val r = new Reader(bytes)
    if (r.fileIdentifier != "da00") return null
    try {
      val root = r.rootTable
      val src  = r.field(root, 0)
      val tsP  = r.field(root, 1)
      val varV = r.field(root, 2)
      val vars =
        if (varV < 0) Array.empty[InternalRow]
        else r.offsetVector(varV).map { vt =>
          def str(id: Int): UTF8String = {
            val p = r.field(vt, id)
            if (p < 0) null else UTF8String.fromString(r.string(p))
          }
          val dtP  = r.field(vt, 4)
          val code = (if (dtP < 0) 0 else r.i8(dtP).toInt) - 1 // da00 none=0
          val axP  = r.field(vt, 5)
          val shP  = r.field(vt, 6)
          val daP  = r.field(vt, 7)
          InternalRow(
            str(0), str(1), str(2),
            new GenericArrayData(
              if (axP < 0) Array.empty[Any]
              else r.stringVector(axP).map(s => UTF8String.fromString(s): Any)),
            new GenericArrayData(
              if (shP < 0) Array.empty[Long] else r.i64Vector(shP)),
            UTF8String.fromString(if (code < 0) "none" else DTypes.name(code)),
            new GenericArrayData(
              if (daP < 0 || code < 0) Array.empty[Double]
              else r.elemVectorAsDouble(daP, code, lengthInBytes = true)))
        }
      InternalRow(
        if (src < 0) null else UTF8String.fromString(r.string(src)),
        if (tsP < 0) 0L else r.i64(tsP),
        new GenericArrayData(vars.map(v => v: Any)))
    } catch { case _: IndexOutOfBoundsException => null }
  }

  case class DecodeDa00(child: Expression) extends StaticCallCodegen {
    override def dataType: DataType = da00Type
    protected def staticMethod   = "da00Eval"
    protected def nullableResult = true
    override def nullSafeEval(input: Any): Any =
      da00Eval(input.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): DecodeDa00 = copy(c)
  }

  // ---- column API ----------------------------------------------------
  // Spark 4 Column ↔ catalyst Expression bridge (classic mode)

  import org.apache.spark.sql.GraftBridge.{column, expression => toExpr}

  def decode_envelope(c: Column): Column = column(DecodeEnvelope(toExpr(c)))
  def decode_f144(c: Column): Column    = column(DecodeF144(toExpr(c)))
  def decode_ev44(c: Column): Column    = column(DecodeEv44(toExpr(c)))
  def decode_al00(c: Column): Column    = column(DecodeAl00(toExpr(c)))
  def decode_ep01(c: Column): Column    = column(DecodeEp01(toExpr(c)))
  def decode_tdct(c: Column): Column    = column(DecodeTdct(toExpr(c)))
  def decode_se00(c: Column): Column    = column(DecodeSe00(toExpr(c)))
  def decode_ad00(c: Column): Column    = column(DecodeAd00(toExpr(c)))
  def decode_da00(c: Column): Column    = column(DecodeDa00(toExpr(c)))
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

  private def i64Vec(b: FlatBufferBuilder, xs: Seq[Long]): Int = {
    b.startVector(8, xs.length, 8)
    xs.reverse.foreach(b.addLong)
    b.endVector()
  }

  /** Pack doubles as a typed little-endian byte payload per [[FlatBufferReader.DTypes]]
    * code — the ad00/da00 `[ubyte]` data carrier.
    */
  private def packedBytes(values: Seq[Double], code: Int): Array[Byte] = {
    import FlatBufferReader.DTypes
    val size = DTypes.byteSize(code)
    val buf  = java.nio.ByteBuffer.allocate(values.length * size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    values.foreach { v =>
      code match {
        case DTypes.Int8 | DTypes.UInt8 | DTypes.CString => buf.put(v.toByte)
        case DTypes.Int16 | DTypes.UInt16                => buf.putShort(v.toShort)
        case DTypes.Int32 | DTypes.UInt32                => buf.putInt(v.toInt)
        case DTypes.Int64 | DTypes.UInt64                => buf.putLong(v.toLong)
        case DTypes.Float32                              => buf.putFloat(v.toFloat)
        case _                                           => buf.putDouble(v)
      }
    }
    buf.array()
  }

  /** al00 Alarm (field ids per [[Decode.DecodeAl00]]). */
  def al00(source: String, tsNs: Long, severity: Short, message: String): Array[Byte] = {
    val b      = new FlatBufferBuilder(128)
    val srcOff = b.createString(source)
    val msgOff = b.createString(message)
    b.startTable(4)
    b.addOffset(0, srcOff, 0)
    b.addLong(1, tsNs, 0L)
    b.addShort(2, severity, 0)
    b.addOffset(3, msgOff, 0)
    val root = b.endTable()
    b.finish(root, "al00")
    b.sizedByteArray()
  }

  /** ep01 EpicsPVConnectionInfo (`FlatBufferGenerators.h:67-83`). */
  def ep01(source: String, tsNs: Long, status: Short): Array[Byte] = {
    val b      = new FlatBufferBuilder(96)
    val srcOff = b.createString(source)
    b.startTable(3)
    b.addOffset(0, srcOff, 0)
    b.addLong(1, tsNs, 0L)
    b.addShort(2, status, 0)
    val root = b.endTable()
    b.finish(root, "ep01")
    b.sizedByteArray()
  }

  /** tdct timestamp message (field ids per [[Decode.DecodeTdct]]). */
  def tdct(name: String, timestamps: Seq[Long], sequenceCounter: Long = 0L): Array[Byte] = {
    val b       = new FlatBufferBuilder(128)
    val nameOff = b.createString(name)
    val tsOff   = i64Vec(b, timestamps)
    b.startTable(3)
    b.addOffset(0, nameOff, 0)
    b.addOffset(1, tsOff, 0)
    b.addInt(2, sequenceCounter.toInt, 0)
    val root = b.endTable()
    b.finish(root, "tdct")
    b.sizedByteArray()
  }

  /** se00 SampleEnvironmentData with the typed array union
    * (field ids per [[Decode.DecodeSe00]]; `se00_Writer.cpp:135-224`).
    * `valuesType` is a [[FlatBufferReader.DTypes]] name ("int8" … "float64").
    */
  def se00(
      name: String,
      channel: Int,
      timeDeltaNs: Double,
      timestamps: Option[Seq[Long]],
      messageCounter: Long,
      packetTsNs: Long,
      values: Seq[Double],
      valuesType: String = "float64"
  ): Array[Byte] = {
    import FlatBufferReader.{DTypes, Se00Value}
    val code   = math.max(DTypes.code(valuesType), 0)
    val member = code + Se00Value.Int8Array // union ids shadow dtype order
    val b       = new FlatBufferBuilder(256)
    val nameOff = b.createString(name)
    val tsOff   = timestamps.map(t => i64Vec(b, t))
    // typed element vector, then the union member table wrapping it
    val size = DTypes.byteSize(code)
    b.startVector(size, values.length, size)
    values.reverse.foreach { v =>
      code match {
        case DTypes.Int8 | DTypes.UInt8   => b.addByte(v.toByte)
        case DTypes.Int16 | DTypes.UInt16 => b.addShort(v.toShort)
        case DTypes.Int32 | DTypes.UInt32 => b.addInt(v.toInt)
        case DTypes.Int64 | DTypes.UInt64 => b.addLong(v.toLong)
        case DTypes.Float32               => b.addFloat(v.toFloat)
        case _                            => b.addDouble(v)
      }
    }
    val vecOff = b.endVector()
    b.startTable(1)
    b.addOffset(0, vecOff, 0)
    val memberOff = b.endTable()
    b.startTable(9)
    b.addOffset(0, nameOff, 0)
    b.addInt(1, channel, 0)
    b.addDouble(2, timeDeltaNs, 0.0)
    // timestamp_location (3) left default
    tsOff.foreach(o => b.addOffset(4, o, 0))
    b.addLong(5, messageCounter, 0L)
    b.addLong(6, packetTsNs, 0L)
    b.addByte(7, member.toByte, 0)
    b.addOffset(8, memberOff, 0)
    val root = b.endTable()
    b.finish(root, "se00")
    b.sizedByteArray()
  }

  /** ad00 ADArray (`FlatBufferGenerators.h:141-178`; field ids per
    * [[Decode.DecodeAd00]]). Data packed little-endian per `dataType`.
    */
  def ad00(
      source: String,
      tsNs: Long,
      dimensions: Seq[Long],
      values: Seq[Double],
      dataType: String = "float64"
  ): Array[Byte] = {
    import FlatBufferReader.DTypes
    val code    = math.max(DTypes.code(dataType), 0)
    val b       = new FlatBufferBuilder(256)
    val srcOff  = b.createString(source)
    val dataOff = b.createByteVector(packedBytes(values, code))
    val dimOff  = i64Vec(b, dimensions)
    b.startTable(6)
    b.addOffset(0, srcOff, 0)
    b.addLong(1, tsNs, 0L)
    b.addOffset(2, dimOff, 0)
    b.addByte(3, code.toByte, 0)
    b.addOffset(4, dataOff, 0)
    val root = b.endTable()
    b.finish(root, "ad00")
    b.sizedByteArray()
  }

  /** One da00 variable for [[da00]]. */
  final case class Da00Var(
      name: String,
      unit: String,
      label: String,
      axes: Seq[String],
      shape: Seq[Long],
      dataType: String,
      values: Seq[Double])

  /** da00 DataArray (`FlatBufferGenerators.h:181-225`; field ids per
    * [[Decode.DecodeDa00]]; da00_dtype has none=0 so codes shift by one).
    */
  def da00(source: String, tsNs: Long, variables: Seq[Da00Var]): Array[Byte] = {
    import FlatBufferReader.DTypes
    val b      = new FlatBufferBuilder(512)
    val srcOff = b.createString(source)
    val varOffs = variables.map { v =>
      val code    = math.max(DTypes.code(v.dataType), 0)
      val nameOff = b.createString(v.name)
      val unitOff = if (v.unit.isEmpty) 0 else b.createString(v.unit)
      val lblOff  = if (v.label.isEmpty) 0 else b.createString(v.label)
      val axOffs  = v.axes.map(b.createString(_))
      b.startVector(4, axOffs.length, 4)
      axOffs.reverse.foreach(b.addOffset)
      val axesOff  = b.endVector()
      val shapeOff = i64Vec(b, v.shape)
      val dataOff  = b.createByteVector(packedBytes(v.values, code))
      b.startTable(8)
      b.addOffset(0, nameOff, 0)
      if (unitOff != 0) b.addOffset(1, unitOff, 0)
      if (lblOff != 0) b.addOffset(2, lblOff, 0)
      b.addByte(4, (code + 1).toByte, 0) // da00_dtype: none=0
      b.addOffset(5, axesOff, 0)
      b.addOffset(6, shapeOff, 0)
      b.addOffset(7, dataOff, 0)
      b.endTable()
    }
    b.startVector(4, varOffs.length, 4)
    varOffs.reverse.foreach(b.addOffset)
    val varsOff = b.endVector()
    b.startTable(3)
    b.addOffset(0, srcOff, 0)
    b.addLong(1, tsNs, 0L)
    b.addOffset(2, varsOff, 0)
    val root = b.endTable()
    b.finish(root, "da00")
    b.sizedByteArray()
  }
}
