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
}
