package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.commands.CommandProtocol
import graft.functions.FlatBufferReader.Reader

/** Property-based fuzzing of the wire layer: encode/decode round-trips
  * hold for arbitrary inputs, and the decoder never throws on corrupted
  * buffers (it classifies or returns an error, F8 semantics).
  */
class WireFuzzSpec extends SparkSpec {

  /** seeded deterministic sampling in place of the scalatest-scalacheck
    * bridge (not in the offline cache) */
  private def forAll[A](gen: Gen[A], n: Int = 50)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      check(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val sourceGen = Gen.asciiPrintableStr.suchThat(_.length < 200)

  test("f144 encode/decode round-trips for arbitrary sources, times, values") {
    forAll(Gen.zip(sourceGen, Gen.chooseNum(1L, Long.MaxValue / 2),
      Gen.chooseNum(-1e12, 1e12))) { case (src, ts, v) =>
      val bytes = FbEncoders.f144(src, ts, v)
      val r     = new Reader(bytes)
      val root  = r.rootTable
      assert(r.fileIdentifier == "f144")
      assert(r.string(r.field(root, 0)) == src)
      assert(r.i64(r.field(root, 3)) == ts)
    }
  }

  test("ev44 encode/decode round-trips for arbitrary arrays") {
    forAll(Gen.zip(sourceGen, Gen.listOf(Gen.chooseNum(Int.MinValue, Int.MaxValue)))) {
      case (src, tof) =>
        val bytes = FbEncoders.ev44(src, Seq(1L), Seq(0), tof, tof)
        val r     = new Reader(bytes)
        val root  = r.rootTable
        assert(r.i32Vector(r.field(root, 4)).toSeq == tof)
    }
  }

  test("pl72/6s4t round-trip for arbitrary field content") {
    forAll(Gen.zip(sourceGen, sourceGen, Gen.chooseNum(0L, Long.MaxValue / 2))) {
      case (a, b, t) =>
        val rs = CommandProtocol.RunStart(t, t + 1, a, b, a, b, a, b, a)
        assert(CommandProtocol.decodeRunStart(CommandProtocol.encodeRunStart(rs)) ==
          Right(rs))
        val st = CommandProtocol.RunStop(t, a, b, a, b)
        assert(CommandProtocol.decodeRunStop(CommandProtocol.encodeRunStop(st)) ==
          Right(st))
    }
  }

  test("al00/ep01 encode/decode round-trips") {
    forAll(Gen.zip(sourceGen, Gen.chooseNum(1L, Long.MaxValue / 2),
      Gen.chooseNum(0, 3), sourceGen)) { case (src, ts, sev, msg) =>
      val r    = new Reader(FbEncoders.al00(src, ts, sev.toShort, msg))
      val root = r.rootTable
      assert(r.fileIdentifier == "al00")
      assert(r.string(r.field(root, 0)) == src)
      assert(r.i64(r.field(root, 1)) == ts)
      // a default-valued field is omitted from the wire (field() == -1)
      val sevP = r.field(root, 2)
      assert((if (sevP < 0) 0 else r.i16(sevP).toInt) == sev)
      assert(r.string(r.field(root, 3)) == msg)
      val r2    = new Reader(FbEncoders.ep01(src, ts, 2))
      val root2 = r2.rootTable
      assert(r2.i16(r2.field(root2, 2)) == 2)
    }
  }

  test("tdct encode/decode round-trips incl. u64 bit patterns") {
    forAll(Gen.zip(sourceGen, Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue)))) {
      case (name, tss) =>
        val r    = new Reader(FbEncoders.tdct(name, tss, 12L))
        val root = r.rootTable
        assert(r.i64Vector(r.field(root, 1)).toSeq == tss)
        assert((r.i32(r.field(root, 2)) & 0xffffffffL) == 12L)
    }
  }

  test("se00 encode/decode round-trips across all ten value types") {
    import graft.functions.FlatBufferReader.{DTypes, Se00Value}
    val smallVals = Seq(1.0, 2.0, 3.0, 100.0)
    DTypes.names.dropRight(1).foreach { tn => // c_string not a se00 member
      val bytes = FbEncoders.se00("sensor", 3, 5.5, Some(Seq(10L, 20L)),
        42L, 1234L, smallVals, tn)
      val r    = new Reader(bytes)
      val root = r.rootTable
      assert(r.fileIdentifier == "se00")
      assert(r.string(r.field(root, 0)) == "sensor")
      assert(r.i32(r.field(root, 1)) == 3)
      assert(r.f64(r.field(root, 2)) == 5.5)
      assert(r.i64Vector(r.field(root, 4)).toSeq == Seq(10L, 20L))
      assert(r.i64(r.field(root, 5)) == 42L)
      assert(r.i64(r.field(root, 6)) == 1234L)
      val member = r.i8(r.field(root, 7)).toInt
      assert(member == DTypes.code(tn) + Se00Value.Int8Array)
      val vecP = r.field(r.indirect(r.field(root, 8)), 0)
      assert(r.elemVectorAsDouble(vecP, DTypes.code(tn),
        lengthInBytes = false).toSeq == smallVals)
    }
  }

  test("ad00/da00 raw-byte payload round-trips across element types") {
    import graft.functions.FlatBufferReader.DTypes
    val vals = Seq(5.0, 6.0, 7.0, 8.0)
    DTypes.names.foreach { tn =>
      val code = DTypes.code(tn)
      val r    = new Reader(FbEncoders.ad00("cam", 99L, Seq(2L, 2L), vals, tn))
      val root = r.rootTable
      assert(r.i64Vector(r.field(root, 2)).toSeq == Seq(2L, 2L))
      val dtP = r.field(root, 3) // int8 (code 0) is the omitted default
      assert((if (dtP < 0) 0 else r.i8(dtP).toInt) == code)
      assert(r.elemVectorAsDouble(r.field(root, 4), code,
        lengthInBytes = true).toSeq == vals)
    }
    val da = new Reader(FbEncoders.da00("src", 7L, Seq(
      FbEncoders.Da00Var("v1", "m", "lbl", Seq("x", "y"), Seq(2L, 2L), "int16", vals))))
    val root = da.rootTable
    val vt   = da.offsetVector(da.field(root, 2))(0)
    assert(da.string(da.field(vt, 0)) == "v1")
    assert(da.string(da.field(vt, 1)) == "m")
    assert(da.i8(da.field(vt, 4)).toInt == DTypes.code("int16") + 1)
    assert(da.stringVector(da.field(vt, 5)).toSeq == Seq("x", "y"))
    assert(da.i64Vector(da.field(vt, 6)).toSeq == Seq(2L, 2L))
    assert(da.elemVectorAsDouble(da.field(vt, 7), DTypes.code("int16"),
      lengthInBytes = true).toSeq == vals)
  }

  test("se00 envelope dispatch extracts packet_timestamp (no UnknownFlatbufferID)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val bytes = FbEncoders.se00("sensor", 0, 1.0, None, 1L, 555000L, Seq(1.0), "float64")
    val out = Seq(Tuple1(bytes)).toDF("value")
      .select(Decode.decode_envelope(col("value")).as("d"))
      .select("d.schema_id", "d.source_name", "d.timestamp", "d.valid")
      .collect()(0)
    assert(out.getString(0) == "se00")
    assert(out.getString(1) == "sensor")
    assert(out.getLong(2) == 555000L)
    assert(out.getBoolean(3))
  }

  test("all payload decoders survive arbitrary byte garbage and truncation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val decoders = Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
      Decode.decode_al00, Decode.decode_ep01, Decode.decode_tdct,
      Decode.decode_se00, Decode.decode_ad00, Decode.decode_da00)
    forAll(Gen.listOfN(40, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)), n = 10) { bs =>
      decoders.foreach { dec =>
        val out = Seq(Tuple1(bs.toArray)).toDF("value")
          .select(dec(col("value")).as("d")).collect()
        assert(out.length == 1)
      }
    }
    val full = FbEncoders.se00("s", 1, 1.0, Some(Seq(1L)), 1L, 99L, Seq(1.0, 2.0), "int32")
    (1 until full.length by 5).foreach { n =>
      decoders.foreach { dec =>
        val out = Seq(Tuple1(full.take(n))).toDF("value")
          .select(dec(col("value")).as("d")).collect()
        assert(out.length == 1)
      }
    }
  }

  test("outbound answ/x5f2/wrdn round-trip for arbitrary content") {
    forAll(Gen.zip(sourceGen, sourceGen, Gen.oneOf(true, false),
      Gen.chooseNum(0L, Long.MaxValue / 2))) { case (a, b, flag, t) =>
      val action  = if (flag) CommandProtocol.ActionType.StartJob
                    else CommandProtocol.ActionType.SetStopTime
      val outcome = if (flag) CommandProtocol.ActionOutcome.Success
                    else CommandProtocol.ActionOutcome.Failure
      assert(CommandProtocol.decodeAnswer(
        CommandProtocol.encodeAnswer(a, b, action, outcome, 42, t, b, a)) ==
        Right(CommandProtocol.Answer(a, b, action, outcome, 42, t, b, a)))
      val st = CommandProtocol.decodeStatus(
        CommandProtocol.encodeStatus(a, b, t)).toOption.get
      assert(st.serviceId == a && st.statusJson == b && st.updateIntervalMs == t)
      assert(CommandProtocol.decodeFinished(
        CommandProtocol.encodeFinished(a, b, flag, a, b, a)) ==
        Right(CommandProtocol.Finished(a, b, flag, a, b, a)))
    }
  }

  test("envelope decode never throws on arbitrary byte garbage") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    forAll(Gen.listOfN(40, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)), n = 25) { bs =>
      val out = Seq(Tuple1(bs.toArray)).toDF("value")
        .select(Decode.decode_envelope(col("value")).as("d"))
        .select("d.valid", "d.error")
        .collect()
      assert(out.length == 1) // no exception; classified instead
    }
  }

  test("truncated valid buffers never crash the envelope decoder") {
    val full = FbEncoders.f144("src", 123456789L, 42.0)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    (1 until full.length by 3).foreach { n =>
      val out = Seq(Tuple1(full.take(n))).toDF("value")
        .select(Decode.decode_envelope(col("value")).as("d"))
        .select("d.valid")
        .collect()
      assert(out.length == 1)
    }
  }
}
