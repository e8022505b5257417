package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: media payloads
  * as opaque `binary` columns with typed metadata, processed per-partition
  * in batches (the Scala analog of `mapInPandas` batch processing).
  *
  * The P6-PPM image and RIFF/PCM16 WAV codecs are REAL, from-scratch
  * byte-level implementations of the public formats ([[ppmFeatures]],
  * [[ppmResize]], [[wavFeatures]], [[wavResample]]), wire-fuzzed in
  * `PpmCodecSpec`/`WavCodecSpec`. Only formats that genuinely need an
  * external library (JPEG entropy coding, video containers) are reduced
  * to deterministic byte-level stand-ins, marked at their definitions
  * ([[AssetFeatures.head_sum]], [[sampleFrames]]). Everything around the
  * codecs is the real engine surface either way: schema, typed Dataset
  * plumbing, per-partition iteration (one codec init per partition, not
  * per row), partitioning and batch shape.
  */
object MultimodalOps {

  /** A media asset row: opaque payload + the typed metadata a real
    * pipeline would carry (content addressing, mime, dimensions).
    */
  final case class Asset(id: Long, mime: String, content: Array[Byte])

  final case class AssetFeatures(
      id: Long,
      n_bytes: Long,
      content_md5: String,
      head_sum: Long // STUB for decoded-content features
  )

  final case class Frame(id: Long, frame_idx: Int, frame_md5: String)

  /** STUB codec: a real implementation would decode the payload with an
    * image/audio library here. Deterministic byte-level features instead;
    * the per-partition structure (init once, stream rows) is the real
    * pattern for codec amortization.
    */
  private def decodeFeatures(it: Iterator[Asset]): Iterator[AssetFeatures] = {
    val md = MessageDigest.getInstance("MD5") // per-partition init (≙ codec handle)
    it.map { a =>
      md.reset()
      val digest = md.digest(a.content).map("%02x".format(_)).mkString
      AssetFeatures(
        a.id,
        a.content.length.toLong,
        digest,
        a.content.take(8).foldLeft(0L)((s, b) => s + (b & 0xff))
      )
    }
  }

  /** Decode/feature-extract over a partitioned asset Dataset. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(decodeFeatures)
  }

  /** STUB frame sampler: n evenly spaced fixed-width byte windows standing
    * in for video frame extraction; real pattern = one row per (asset,
    * frame) with deterministic placement.
    */
  def sampleFrames(assets: Dataset[Asset], n: Int, width: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      val len = a.content.length
      if (len < width) Iterator.empty
      else {
        val step = if (n == 1) 0 else (len - width) / (n - 1)
        val md   = MessageDigest.getInstance("MD5")
        (0 until n).iterator.map { i =>
          val off   = i * step
          val bytes = a.content.slice(off, off + width)
          md.reset()
          Frame(a.id, i, md.digest(bytes).map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** STUB resize: fixed-size re-encode standing in for image resizing —
    * truncate or cyclically pad the payload to `targetBytes`. A real
    * implementation swaps the body for an image library call; the
    * shape-contract (every output payload identically sized, metadata
    * updated) is what downstream batching relies on.
    */
  def resize(assets: Dataset[Asset], targetBytes: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.map { a =>
      val out = new Array[Byte](targetBytes)
      if (a.content.nonEmpty) {
        var i = 0
        while (i < targetBytes) { out(i) = a.content(i % a.content.length); i += 1 }
      }
      Asset(a.id, a.mime, out)
    }
  }

  /** Documents → assets view: UTF-8 text bytes as the opaque payload (the
    * test stand-in for real media blobs).
    */
  def documentAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("id"),
      lit("text/plain").as("mime"),
      encode(col("text"), "UTF-8").as("content")
    ).as[Asset]
  }

  // --- a REAL codec: P6 PPM (netpbm) -----------------------------------
  // Pure byte parsing, no libraries — the proof that the stub seams above
  // are genuinely pluggable: same Dataset plumbing, an actual decoder in
  // the partition loop.

  final case class PpmImage(width: Int, height: Int, maxval: Int, pixels: Array[Byte])

  final case class ImageFeatures(
      id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Decode a binary P6 PPM payload (header tokens with whitespace and
    * `#` comments per the netpbm spec, then raw 8-bit RGB). None for
    * anything malformed or truncated — decode failures are data, not
    * exceptions, in a pipeline.
    */
  def decodePpm(bytes: Array[Byte]): Option[PpmImage] =
    decodePpmAt(bytes, 0).map(_._1)

  /** Cursor-based decode: parse ONE P6 frame starting at `start`,
    * returning the image and the offset just past its raster — the
    * primitive that makes multi-frame containers ([[decodePpmSequence]])
    * parseable without re-scanning.
    */
  def decodePpmAt(bytes: Array[Byte], start: Int): Option[(PpmImage, Int)] = {
    var i = start
    def skipSpace(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        val b = bytes(i)
        if (b == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (b == ' ' || b == '\t' || b == '\r' || b == '\n') i += 1
        else go = false
      }
    }
    def token(): Option[String] = {
      skipSpace()
      val start = i
      while (i < bytes.length && !bytes(i).toChar.isWhitespace) i += 1
      if (i > start) Some(new String(bytes, start, i - start, "US-ASCII")) else None
    }
    for {
      magic <- token() if magic == "P6"
      w     <- token().flatMap(_.toIntOption) if w > 0
      h     <- token().flatMap(_.toIntOption) if h > 0
      mx    <- token().flatMap(_.toIntOption) if mx > 0 && mx < 256
      // exactly ONE whitespace byte separates header from raster
      _     <- if (i < bytes.length && bytes(i).toChar.isWhitespace) Some(()) else None
      rasterStart = i + 1
      // Long math: w·h·3 overflows Int for adversarial headers (e.g.
      // w = 715827883), which would turn the size check into a crash;
      // any raster that fits the payload necessarily fits an Int
      need = w.toLong * h * 3
      if bytes.length - rasterStart >= need
    } yield (PpmImage(w, h, mx,
      java.util.Arrays.copyOfRange(bytes, rasterStart, rasterStart + need.toInt)),
      rasterStart + need.toInt)
  }

  /** A REAL multi-frame container (the video seam): back-to-back P6
    * frames parsed sequentially by cursor. Parsing stops at the first
    * byte that doesn't start a valid frame — a well-formed prefix of a
    * corrupt stream still yields its frames (errors are data).
    */
  def decodePpmSequence(bytes: Array[Byte]): Vector[PpmImage] = {
    val frames = Vector.newBuilder[PpmImage]
    var i  = 0
    var ok = true
    while (ok && i < bytes.length) {
      decodePpmAt(bytes, i) match {
        case Some((img, next)) => frames += img; i = next
        case None              => ok = false
      }
    }
    frames.result()
  }

  final case class VideoFrameFeatures(
      id: Long, frame_idx: Int, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Per-frame dimensions + channel means through the REAL sequence
    * parser; assets with no parseable leading frame yield nothing.
    */
  def videoFrameFeatures(assets: Dataset[Asset]): Dataset[VideoFrameFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap { a =>
      decodePpmSequence(a.content).zipWithIndex.map { case (img, idx) =>
        var r = 0L; var g = 0L; var b = 0L
        var p = 0
        while (p < img.pixels.length) {
          r += img.pixels(p) & 0xff
          g += img.pixels(p + 1) & 0xff
          b += img.pixels(p + 2) & 0xff
          p += 3
        }
        val n = (img.width * img.height).toDouble
        VideoFrameFeatures(a.id, idx, img.width, img.height, r / n, g / n, b / n)
      }
    })
  }

  /** Encode back to canonical P6 bytes. */
  def encodePpm(img: PpmImage): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n${img.maxval}\n".getBytes("US-ASCII")
    header ++ img.pixels
  }

  /** Per-image dimensions + channel means from the REAL decoder; assets
    * that don't decode are dropped (the error-as-filter convention of
    * F8). Per-partition iteration, one pass over the raster.
    */
  def ppmFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap { a =>
      decodePpm(a.content).map { img =>
        var r = 0L; var g = 0L; var b = 0L
        var p = 0
        while (p < img.pixels.length) {
          r += img.pixels(p) & 0xff
          g += img.pixels(p + 1) & 0xff
          b += img.pixels(p + 2) & 0xff
          p += 3
        }
        val n = (img.width * img.height).toDouble
        ImageFeatures(a.id, img.width, img.height, r / n, g / n, b / n)
      }
    })
  }

  // --- a REAL codec #2: 16-bit PCM WAV (RIFF) --------------------------
  // Same proof for the audio seam: little-endian RIFF chunk walk, PCM
  // fmt validation, int16 frames — no libraries, decode failures are
  // data (None), not exceptions.

  final case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Short])

  final case class AudioFeatures(
      id: Long, sample_rate: Int, channels: Int,
      n_samples: Long, rms: Double, peak: Int, mean: Double)

  /** Decode a RIFF/WAVE payload: chunk walk (word-aligned), `fmt ` must
    * be PCM(1)/16-bit, `data` holds little-endian int16 interleaved
    * frames. None for anything malformed, truncated, or non-PCM16.
    */
  def decodeWav(bytes: Array[Byte]): Option[WavAudio] = {
    def u16(i: Int): Int  = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (u16(i).toLong | (u16(i + 2).toLong << 16)) & 0xffffffffL
    def tag(i: Int)       = new String(bytes, i, 4, "US-ASCII")
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int)]    = None
    var data: Option[Array[Short]] = None
    while (i + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id   = tag(i)
      val sz   = u32(i + 4).toInt
      val body = i + 8
      // compare against the REMAINING length, not body + sz (which
      // overflows Int for adversarial 2^31-ish sizes and would let the
      // cursor/array math crash instead of returning None)
      if (sz < 0 || sz > bytes.length - body) return None
      id match {
        case "fmt " if sz >= 16 =>
          val audioFormat = u16(body)
          val ch          = u16(body + 2)
          val rate        = u32(body + 4).toInt
          val bits        = u16(body + 14)
          if (audioFormat != 1 || bits != 16 || ch <= 0 || rate <= 0) return None
          fmt = Some((ch, rate))
        case "data" =>
          val n = sz / 2
          val s = new Array[Short](n)
          var k = 0
          while (k < n) { s(k) = u16(body + 2 * k).toShort; k += 1 }
          data = Some(s)
        case _ => ()
      }
      i = body + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    for ((ch, rate) <- fmt; s <- data) yield WavAudio(rate, ch, s)
  }

  /** Encode back to canonical 44-byte-header RIFF/PCM16 bytes
    * (round-trips through [[decodeWav]]).
    */
  def encodeWav(a: WavAudio): Array[Byte] = {
    val dataLen = a.samples.length * 2
    val out     = new Array[Byte](44 + dataLen)
    def putTag(i: Int, s: String): Unit =
      System.arraycopy(s.getBytes("US-ASCII"), 0, out, i, 4)
    def put16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(i: Int, v: Long): Unit = {
      put16(i, (v & 0xffff).toInt); put16(i + 2, ((v >> 16) & 0xffff).toInt)
    }
    putTag(0, "RIFF"); put32(4, 36L + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, a.channels)
    put32(24, a.sampleRate.toLong); put32(28, a.sampleRate.toLong * a.channels * 2)
    put16(32, a.channels * 2); put16(34, 16)
    putTag(36, "data"); put32(40, dataLen.toLong)
    var k = 0
    while (k < a.samples.length) { put16(44 + 2 * k, a.samples(k) & 0xffff); k += 1 }
    out
  }

  /** Per-clip rate/channels/RMS/peak/mean from the REAL decoder;
    * undecodable assets are dropped (the error-as-filter convention).
    */
  def wavFeatures(assets: Dataset[Asset]): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap { a =>
      decodeWav(a.content).map { w =>
        var sum = 0.0; var sq = 0.0; var peak = 0
        var k = 0
        while (k < w.samples.length) {
          val s = w.samples(k).toInt
          sum += s; sq += s.toDouble * s
          if (math.abs(s) > peak) peak = math.abs(s)
          k += 1
        }
        val n = math.max(w.samples.length, 1).toDouble
        AudioFeatures(a.id, w.sampleRate, w.channels, w.samples.length.toLong,
          math.sqrt(sq / n), peak, sum / n)
      }
    })
  }

  /** REAL nearest-neighbor sample-rate conversion (the audio "resize"):
    * decode, pick source frames on the integer grid, re-encode as valid
    * PCM16 at the target rate. Undecodable assets pass through.
    */
  def wavResample(assets: Dataset[Asset], targetRate: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    require(targetRate > 0)
    assets.map { a =>
      decodeWav(a.content) match {
        case None => a
        // a valid clip with fewer samples than one frame has nothing to
        // resample — pass it through (forcing one output frame would
        // index sample −1)
        case Some(w) if w.samples.length < w.channels => a
        case Some(w) =>
          val frames    = w.samples.length / w.channels
          val outFramesL = math.max(1L, frames.toLong * targetRate / w.sampleRate)
          // an extreme upsample ratio can push the output past Int array
          // bounds — errors are data: pass the clip through untouched
          // rather than wrap the size math
          if (outFramesL * w.channels > (Int.MaxValue - 64) / 2) a
          else {
          val outFrames = outFramesL.toInt
          val out       = new Array[Short](outFrames * w.channels)
          var i = 0
          while (i < outFrames) {
            val src = math.min((i.toLong * w.sampleRate / targetRate).toInt, frames - 1)
            var c = 0
            while (c < w.channels) {
              out(i * w.channels + c) = w.samples(src * w.channels + c)
              c += 1
            }
            i += 1
          }
          Asset(a.id, "audio/wav", encodeWav(WavAudio(targetRate, w.channels, out)))
          }
      }
    }
  }

  /** REAL nearest-neighbor resize: decode, sample source pixels on the
    * integer grid, re-encode as valid P6 (round-trips through
    * [[decodePpm]]). Undecodable assets pass through untouched.
    */
  def ppmResize(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    require(w > 0 && h > 0 && w.toLong * h * 3 <= Int.MaxValue - 64,
      s"target raster $w x $h exceeds array bounds")
    assets.map { a =>
      decodePpm(a.content) match {
        case None => a
        case Some(img) =>
          val out = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            val sy = y * img.height / h
            var x = 0
            while (x < w) {
              val sx  = x * img.width / w
              val src = (sy * img.width + sx) * 3
              val dst = (y * w + x) * 3
              out(dst) = img.pixels(src)
              out(dst + 1) = img.pixels(src + 1)
              out(dst + 2) = img.pixels(src + 2)
              x += 1
            }
            y += 1
          }
          Asset(a.id, "image/x-portable-pixmap",
            encodePpm(PpmImage(w, h, img.maxval, out)))
      }
    }
  }
}
