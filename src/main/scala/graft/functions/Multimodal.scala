package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: assets are opaque `binary` columns with typed metadata, and
  * decode / feature-extraction / frame-sampling run as batched
  * per-partition transforms (the Scala analog of `mapInPandas`: one
  * `mapPartitions` over a typed Dataset, amortizing any codec setup across
  * a whole partition).
  *
  * STUB BOUNDARY: this container has no image/audio codecs, so
  * [[FakeCodec]] is a clearly-marked deterministic stand-in — it parses our
  * own 16-byte header format instead of JPEG/WAV. Everything around it
  * (schema, Dataset encoders, partition batching, output shapes) is the
  * real Spark plumbing and is tested; swapping in a real codec changes only
  * the body of `FakeCodec.decode`.
  */
object Multimodal {

  /** An asset row: media bytes + provenance. */
  final case class Asset(assetId: Long, kind: String, bytes: Array[Byte], source: String)

  /** Decoded metadata (width/height for images, sampleRate/frames for audio). */
  final case class DecodedAsset(
      assetId: Long, kind: String, width: Int, height: Int,
      frames: Int, bytes: Array[Byte])

  /** Fixed-size feature vector extracted per asset. */
  final case class AssetFeatures(assetId: Long, kind: String, features: Array[Float])

  /** STUB codec: deterministic fake decode. "Format": bytes(0..3) = width,
    * bytes(4..7) = height, bytes(8..11) = frame count (big-endian),
    * remainder = payload. A real implementation would call an image/audio
    * library here — the only code that changes when codecs are available.
    */
  object FakeCodec {
    def decode(a: Asset): DecodedAsset = {
      def be32(off: Int): Int =
        if (a.bytes.length < off + 4) 0
        else ((a.bytes(off) & 0xff) << 24) | ((a.bytes(off + 1) & 0xff) << 16) |
          ((a.bytes(off + 2) & 0xff) << 8) | (a.bytes(off + 3) & 0xff)
      DecodedAsset(a.assetId, a.kind, be32(0), be32(4), be32(8),
        a.bytes.drop(12))
    }
  }

  /** Synthesize a deterministic asset table (for tests/bench: no real media
    * in-container). Payload bytes are a hash-stream of the asset id.
    */
  def syntheticAssets(spark: SparkSession, n: Long, payloadLen: Int = 256): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
      val w = 64 + (id % 64).toInt; val h = 64 + (id % 48).toInt; val f = 1 + (id % 30).toInt
      val header = Array[Byte](
        (w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
        (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte,
        (f >> 24).toByte, (f >> 16).toByte, (f >> 8).toByte, f.toByte)
      val payload = Array.tabulate(payloadLen)(i =>
        (scala.util.hashing.MurmurHash3.productHash((id, i)) & 0xff).toByte)
      Asset(id, kind, header ++ payload, s"synth://$id")
    }
  }

  /** Decode metadata for every asset — batched per partition so a real
    * codec's init cost is paid once per task, not per row.
    */
  def decode(assets: Dataset[Asset]): Dataset[DecodedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it => it.map(FakeCodec.decode) }
  }

  /** Extract a fixed-size feature vector (dim `d`) per asset: a deterministic
    * byte-histogram projection of the payload (stands in for an embedding
    * model; same shape/partitioning as the real thing).
    */
  def features(decoded: Dataset[DecodedAsset], d: Int = 16): Dataset[AssetFeatures] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions { it =>
      it.map { a =>
        val v = new Array[Float](d)
        var i = 0
        while (i < a.bytes.length) { v((a.bytes(i) & 0xff) % d) += 1f; i += 1 }
        val n = math.max(1f, a.bytes.length.toFloat)
        AssetFeatures(a.assetId, a.kind, v.map(_ / n))
      }
    }
  }

  /** Sample up to `k` evenly-spaced "frames" from each video payload
    * (slices of the byte stream — the partitioning/explode shape of real
    * frame sampling). Output one row per (assetId, frameIdx, frameBytes).
    */
  def sampleFrames(decoded: Dataset[DecodedAsset], k: Int = 4): DataFrame = {
    import decoded.sparkSession.implicits._
    decoded.filter(_.kind == "video").flatMap { a =>
      val frames = math.max(1, a.frames)
      val take = math.min(k, frames)
      val frameLen = math.max(1, a.bytes.length / frames)
      (0 until take).map { i =>
        val fi = (i.toLong * frames / take).toInt
        (a.assetId, fi, a.bytes.slice(fi * frameLen, (fi + 1) * frameLen))
      }
    }.toDF("assetId", "frameIdx", "frameBytes")
  }

  /** Resize stub: re-key metadata, keep payload (plumbing for a real
    * resize). Demonstrates the decode → transform → re-encode column shape.
    */
  def resize(decoded: Dataset[DecodedAsset], maxDim: Int): Dataset[DecodedAsset] = {
    import decoded.sparkSession.implicits._
    decoded.map { a =>
      val scale = if (math.max(a.width, a.height) <= maxDim) 1.0
        else maxDim.toDouble / math.max(a.width, a.height)
      a.copy(width = (a.width * scale).toInt, height = (a.height * scale).toInt)
    }
  }
}
