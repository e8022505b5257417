package graft.operators

import graft.SparkSpec
import graft.operators.MultimodalOps._

/** The REAL RIFF/PCM16 codec: byte-exact round-trips, chunk-walk
  * robustness against malformed wire bytes, and the resampler's
  * integer-grid frame selection.
  */
class WavCodecSpec extends SparkSpec {
  import spark.implicits._

  private val clip = WavAudio(8000, 1, Array[Short](0, 512, -1024, 32767, -32768, 7))

  test("encode → decode round-trips rate, channels, and samples exactly") {
    val Some(back) = decodeWav(encodeWav(clip))
    assert(back.sampleRate == 8000 && back.channels == 1)
    assert(back.samples.toSeq == clip.samples.toSeq)
  }

  test("stereo round-trip preserves interleaving") {
    val st = WavAudio(44100, 2, Array[Short](1, -1, 2, -2, 3, -3))
    val Some(back) = decodeWav(encodeWav(st))
    assert(back.channels == 2 && back.samples.toSeq == st.samples.toSeq)
  }

  test("malformed payloads decode to None, never throw") {
    val good = encodeWav(clip)
    val cases = Seq[Array[Byte]](
      Array.empty,
      "RIFFxxxxWAVE".getBytes("US-ASCII"),              // no chunks
      good.take(20),                                    // truncated fmt
      { val b = good.clone(); b(0) = 'X'; b },          // bad magic
      { val b = good.clone(); b(20) = 3; b },           // non-PCM format code
      { val b = good.clone(); b(34) = 8; b },           // 8-bit, not 16
      { val b = good.clone(); b(40) = 99; b }           // data size past EOF
    )
    cases.foreach(c => assert(decodeWav(c).isEmpty, s"payload len ${c.length}"))
  }

  test("decoder walks unknown chunks (word-aligned) to reach fmt/data") {
    // splice a 3-byte LIST chunk (padded to 4) between WAVE and fmt
    val good   = encodeWav(clip)
    val extra  = "LIST".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    val padded = good.take(12) ++ extra ++ good.drop(12)
    val Some(back) = decodeWav(padded)
    assert(back.samples.toSeq == clip.samples.toSeq)
  }

  test("resample 2:1 keeps even frames; upsample repeats on the integer grid") {
    val ds   = Seq(Asset(1L, "audio/wav", encodeWav(clip))).toDS()
    val down = wavResample(ds, 4000).collect()(0)
    val Some(d) = decodeWav(down.content)
    assert(d.sampleRate == 4000)
    assert(d.samples.toSeq == Seq[Short](0, -1024, -32768))
    val up = wavResample(ds, 16000).collect()(0)
    val Some(u) = decodeWav(up.content)
    assert(u.sampleRate == 16000 && u.samples.length == 12)
    assert(u.samples.toSeq.grouped(2).map(_.head).toSeq == clip.samples.toSeq)
  }

  test("wavFeatures computes RMS/peak/mean per the definition") {
    val ds = Seq(Asset(7L, "audio/wav",
      encodeWav(WavAudio(8000, 1, Array[Short](3, -4))))).toDS()
    val f = wavFeatures(ds).collect()(0)
    assert(f.id == 7L && f.n_samples == 2L && f.peak == 4)
    assert(math.abs(f.rms - math.sqrt((9.0 + 16.0) / 2)) < 1e-12)
    assert(math.abs(f.mean - (-0.5)) < 1e-12)
  }
}
