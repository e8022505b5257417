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
