package graft.operators

import graft.SparkSpec
import MultimodalOps._

/** The REAL multimodal codec: P6 PPM decode, feature extraction, and
  * nearest-neighbor resize — exact pixel-level expectations on
  * hand-constructed images, plus the malformed-input-as-filter rule.
  */
class PpmCodecSpec extends SparkSpec {
  import spark.implicits._

  /** 4×2 image: row 0 = red green blue white, row 1 = black ×4. */
  private def px(rgb: (Int, Int, Int)*): Array[Byte] =
    rgb.flatMap { case (r, g, b) => Seq(r.toByte, g.toByte, b.toByte) }.toArray

  private val topRow = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255))
  private val img42  = PpmImage(4, 2, 255, px(topRow ++ Seq.fill(4)((0, 0, 0)): _*))

  test("decode inverts encode, including comments and odd whitespace") {
    val canonical = encodePpm(img42)
    val got = decodePpm(canonical).get
    assert(got.width == 4 && got.height == 2 && got.maxval == 255)
    assert(got.pixels.toSeq == img42.pixels.toSeq)

    val commented =
      ("P6 # magic\n# a comment line\n 4\t2 # dims\n255\n").getBytes("US-ASCII") ++ img42.pixels
    assert(decodePpm(commented).get.pixels.toSeq == img42.pixels.toSeq)
  }

  test("malformed payloads decode to None, never throw") {
    assert(decodePpm(Array.empty[Byte]).isEmpty)
    assert(decodePpm("P5\n4 2\n255\n".getBytes ++ img42.pixels).isEmpty) // wrong magic
    assert(decodePpm(encodePpm(img42).dropRight(1)).isEmpty)             // truncated raster
    assert(decodePpm("P6\n4 -2\n255\n".getBytes ++ img42.pixels).isEmpty)
    assert(decodePpm("P6\n4 2\n70000\n".getBytes ++ img42.pixels).isEmpty) // 16-bit maxval
  }

  test("features: channel means over the raster; undecodable assets filtered") {
    val assets = Seq(
      Asset(1L, "image/x-portable-pixmap", encodePpm(img42)),
      Asset(2L, "text/plain", "not an image".getBytes)
    ).toDS()
    val feats = ppmFeatures(assets).collect()
    assert(feats.map(_.id).toSeq == Seq(1L))
    val f = feats.head
    assert(f.width == 4 && f.height == 2)
    // sums over 8 pixels: r 255+255=510, g 255+255=510, b 255+255=510
    assert(f.mean_r == 510 / 8.0 && f.mean_g == 510 / 8.0 && f.mean_b == 510 / 8.0)
  }

  test("nearest-neighbor resize produces the exact sampled grid, re-decodable") {
    val assets = Seq(Asset(1L, "image/x-portable-pixmap", encodePpm(img42))).toDS()
    val out = ppmResize(assets, 2, 1).collect().head
    val img = decodePpm(out.content).get
    assert(img.width == 2 && img.height == 1)
    // x=0 → sx=0 (red); x=1 → sx=2 (blue); y=0 → sy=0
    assert(img.pixels.toSeq == px((255, 0, 0), (0, 0, 255)).toSeq)
  }

  test("resize passes through what it cannot decode") {
    val junk = Asset(9L, "text/plain", "junk".getBytes)
    val out  = ppmResize(Seq(junk).toDS(), 2, 2).collect().head
    assert(out.content.toSeq == junk.content.toSeq && out.mime == "text/plain")
  }

  test("sequence parser: frames split at exact raster boundaries") {
    val two = encodePpm(img42) ++ encodePpm(
      PpmImage(1, 1, 255, Array[Byte](1, 2, 3)))
    val frames = decodePpmSequence(two)
    assert(frames.length == 2)
    assert(frames(0).width == 4 && frames(1).width == 1)
    assert(frames(1).pixels.toSeq == Seq[Byte](1, 2, 3))
  }

  test("sequence parser: a corrupt tail yields the well-formed prefix frames") {
    val stream = encodePpm(img42) ++ "GARBAGE".getBytes("US-ASCII")
    val frames = decodePpmSequence(stream)
    assert(frames.length == 1 && frames(0).width == 4)
    assert(decodePpmSequence("junk".getBytes).isEmpty)
  }

  test("adversarial headers whose raster size overflows Int return None") {
    // w·h·3 wraps negative (would pass an Int-math bound check and crash
    // copyOfRange) or wraps to exactly 0 (would accept a zero-byte
    // raster for a 2^32-pixel image)
    val wrapNeg  = "P6 715827883 1 255\nxxxx".getBytes("US-ASCII")
    val wrapZero = "P6 65536 65536 255\n".getBytes("US-ASCII")
    assert(decodePpm(wrapNeg).isEmpty)
    assert(decodePpm(wrapZero).isEmpty)
  }

  test("sequence parser: deterministic random bytes never throw") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val bytes = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(bytes)
      decodePpmSequence(bytes)       // must terminate without throwing
      decodeWav(bytes)               // same for the WAV chunk walk
    }
  }
}
