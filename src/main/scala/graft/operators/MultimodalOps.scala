package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: media payloads
  * as opaque `binary` columns with typed metadata, processed per-partition
  * in batches (the Scala analog of `mapInPandas` batch processing).
  *
  * The actual codecs (image decode, audio resample, video frame extract)
  * are STUBBED — this container has no media libraries — as
  * deterministic byte-level functions, clearly marked below. Everything
  * around them is the real engine surface: schema, typed Dataset plumbing,
  * per-partition iteration (one codec init per partition, not per row),
  * partitioning and batch shape.
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
  def decodePpm(bytes: Array[Byte]): Option[PpmImage] = {
    var i = 0
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
      raster = bytes.drop(i + 1)
      if raster.length >= w * h * 3
    } yield PpmImage(w, h, mx, raster.take(w * h * 3))
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

  /** REAL nearest-neighbor resize: decode, sample source pixels on the
    * integer grid, re-encode as valid P6 (round-trips through
    * [[decodePpm]]). Undecodable assets pass through untouched.
    */
  def ppmResize(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    require(w > 0 && h > 0)
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
