package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: assets are opaque `binary` columns with typed metadata, and
  * decode / feature-extraction / resize / frame-sampling run as batched
  * per-partition transforms (the Scala analog of `mapInPandas`: one
  * `mapPartitions` over a typed Dataset, amortizing codec setup across a
  * whole partition).
  *
  * Codecs: images are REAL binary PPM (P6) and audio is REAL RIFF/WAV
  * PCM-16 — both fully decoded/encoded in pure JVM code below, no external
  * libraries (this container ships none). Video has no sanely pure-JVM
  * container format, so it stays behind the clearly-marked [[FakeCodec]]
  * stub; swapping in a real demuxer changes only that object.
  */
object Multimodal {

  /** An asset row: media bytes + provenance. */
  final case class Asset(assetId: Long, kind: String, bytes: Array[Byte], source: String)

  /** Decoded metadata + (for image/audio) the still-encoded payload.
    * Field mapping per kind — image: width×height pixels, frames=1;
    * audio: width=sampleRate, height=channels, frames=samples/channel;
    * video (stub): fake-header fields.
    */
  final case class DecodedAsset(
      assetId: Long, kind: String, width: Int, height: Int,
      frames: Int, bytes: Array[Byte])

  /** Fixed-size feature vector extracted per asset. */
  final case class AssetFeatures(assetId: Long, kind: String, features: Array[Float])

  // ---------- real codecs (pure JVM, public formats) ----------

  /** Binary PPM (P6) image codec — netpbm format: ASCII header
    * `P6 <width> <height> <maxval>\n` (with `#` comments allowed) followed
    * by width·height·3 raw RGB bytes.
    */
  object Ppm {
    final case class Image(width: Int, height: Int, pixels: Array[Byte])

    def encode(img: Image): Array[Byte] = {
      val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
      header ++ img.pixels
    }

    def decode(bytes: Array[Byte]): Image = {
      var i = 0
      def skipWs(): Unit = {
        var in = true
        while (in && i < bytes.length) {
          val c = bytes(i).toChar
          if (c == '#') while (i < bytes.length && bytes(i) != '\n') i += 1
          else if (c.isWhitespace) i += 1
          else in = false
        }
      }
      def token(): String = {
        skipWs()
        val s = i
        while (i < bytes.length && !bytes(i).toChar.isWhitespace) i += 1
        new String(bytes, s, i - s, "US-ASCII")
      }
      require(token() == "P6", "not a P6 PPM")
      val w = token().toInt
      val h = token().toInt
      val maxval = token().toInt
      require(maxval > 0 && maxval < 256, s"unsupported maxval $maxval")
      i += 1 // single whitespace after maxval
      val pixels = java.util.Arrays.copyOfRange(bytes, i, i + w * h * 3)
      Image(w, h, pixels)
    }

    /** Nearest-neighbor resample to fit maxDim (aspect preserved). */
    def resize(img: Image, maxDim: Int): Image = {
      if (math.max(img.width, img.height) <= maxDim) img
      else {
        val scale = maxDim.toDouble / math.max(img.width, img.height)
        val nw = math.max(1, (img.width * scale).toInt)
        val nh = math.max(1, (img.height * scale).toInt)
        val out = new Array[Byte](nw * nh * 3)
        var y = 0
        while (y < nh) {
          val sy = (y.toLong * img.height / nh).toInt
          var x = 0
          while (x < nw) {
            val sx = (x.toLong * img.width / nw).toInt
            val so = (sy * img.width + sx) * 3
            val doff = (y * nw + x) * 3
            out(doff) = img.pixels(so)
            out(doff + 1) = img.pixels(so + 1)
            out(doff + 2) = img.pixels(so + 2)
            x += 1
          }
          y += 1
        }
        Image(nw, nh, out)
      }
    }
  }

  /** RIFF/WAVE codec, PCM 16-bit little-endian — the canonical header
    * layout: `RIFF<size>WAVE`, an `fmt ` chunk (audioFormat=1, channels,
    * sampleRate, ...), then a `data` chunk of interleaved i16 samples.
    */
  object Wav {
    final case class Audio(channels: Int, sampleRate: Int, samples: Array[Short])

    private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)
    private def le32(v: Int): Array[Byte] =
      Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

    def encode(a: Audio): Array[Byte] = {
      val dataLen = a.samples.length * 2
      val byteRate = a.sampleRate * a.channels * 2
      val out = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(a.channels.toShort)
        .putInt(a.sampleRate).putInt(byteRate)
        .putShort((a.channels * 2).toShort).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      a.samples.foreach(out.putShort)
      out.array()
    }

    def decode(bytes: Array[Byte]): Audio = {
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      require(fourcc() == "RIFF", "not a RIFF file")
      buf.getInt // riff size
      require(fourcc() == "WAVE", "not a WAVE file")
      var channels = 0
      var sampleRate = 0
      var bits = 0
      var samples: Array[Short] = null
      // chunk walk: real WAVs may carry LIST/fact chunks before data
      while (samples == null && buf.remaining() >= 8) {
        val id = fourcc()
        val len = buf.getInt
        id match {
          case "fmt " =>
            val fmt = buf.getShort; channels = buf.getShort
            sampleRate = buf.getInt; buf.getInt; buf.getShort
            bits = buf.getShort
            require(fmt == 1 && bits == 16, s"only PCM16 supported (fmt=$fmt bits=$bits)")
            if (len > 16) buf.position(buf.position() + (len - 16))
          case "data" =>
            val n = len / 2
            val arr = new Array[Short](n)
            var i = 0
            while (i < n) { arr(i) = buf.getShort; i += 1 }
            samples = arr
          case _ =>
            buf.position(buf.position() + len + (len & 1))
        }
      }
      require(samples != null && channels > 0, "no data chunk")
      Audio(channels, sampleRate, samples)
    }
  }

  /** STUB codec for video only: no video container is sanely decodable in
    * pure JVM without codecs, so this parses our own 12-byte header
    * (bytes 0..3 width, 4..7 height, 8..11 frame count, big-endian) over an
    * opaque payload. A real implementation swaps in a demuxer here — the
    * only code that changes.
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

  /** Synthesize a deterministic asset table: REAL P6 images (gradient +
    * id-seeded noise), REAL PCM16 WAVs (id-pitched sine), fake-format video.
    */
  def syntheticAssets(spark: SparkSession, n: Long): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).map { id =>
      (id % 3) match {
        case 0 =>
          val w = 64 + (id % 64).toInt; val h = 64 + (id % 48).toInt
          val px = new Array[Byte](w * h * 3)
          var i = 0
          while (i < px.length) {
            px(i) = ((i + id * 31) % 251).toByte; i += 1
          }
          Asset(id, "image", Ppm.encode(Ppm.Image(w, h, px)), s"synth://$id")
        case 1 =>
          val sr = 8000
          val nSamp = 1600 + (id % 800).toInt
          val freq = 200.0 + (id % 40) * 20.0
          val samples = Array.tabulate(nSamp)(i =>
            (math.sin(2 * math.Pi * freq * i / sr) * 12000).toShort)
          Asset(id, "audio", Wav.encode(Wav.Audio(1, sr, samples)), s"synth://$id")
        case _ =>
          val w = 64 + (id % 64).toInt; val h = 64 + (id % 48).toInt
          val f = 1 + (id % 30).toInt
          val header = Array[Byte](
            (w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
            (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte,
            (f >> 24).toByte, (f >> 16).toByte, (f >> 8).toByte, f.toByte)
          val payload = Array.tabulate(256)(i =>
            (scala.util.hashing.MurmurHash3.productHash((id, i)) & 0xff).toByte)
          Asset(id, "video", header ++ payload, s"synth://$id")
      }
    }
  }

  /** Decode metadata for every asset — batched per partition so codec init
    * is paid once per task, not per row. Images/audio go through the REAL
    * parsers; video through the stub.
    */
  def decode(assets: Dataset[Asset]): Dataset[DecodedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        a.kind match {
          case "image" =>
            val img = Ppm.decode(a.bytes)
            DecodedAsset(a.assetId, a.kind, img.width, img.height, 1, a.bytes)
          case "audio" =>
            val au = Wav.decode(a.bytes)
            DecodedAsset(a.assetId, a.kind, au.sampleRate, au.channels,
              au.samples.length / au.channels, a.bytes)
          case _ => FakeCodec.decode(a)
        }
      }
    }
  }

  /** Extract a fixed-size feature vector (dim `d`, L1-normalized) per asset:
    * images → luminance histogram over REAL decoded pixels; audio → per-bin
    * mean |amplitude| over REAL decoded samples; video (stub) → payload
    * byte histogram.
    */
  def features(decoded: Dataset[DecodedAsset], d: Int = 16): Dataset[AssetFeatures] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions { it =>
      it.map { a =>
        val v = new Array[Float](d)
        a.kind match {
          case "image" =>
            val img = Ppm.decode(a.bytes)
            var i = 0
            while (i + 2 < img.pixels.length) {
              // integer Rec.601-ish luminance
              val lum = ((img.pixels(i) & 0xff) * 299 +
                (img.pixels(i + 1) & 0xff) * 587 +
                (img.pixels(i + 2) & 0xff) * 114) / 1000
              v(lum * d / 256) += 1f
              i += 3
            }
          case "audio" =>
            val au = Wav.decode(a.bytes)
            val n = au.samples.length
            var i = 0
            while (i < n) {
              v(math.min(d - 1, i * d / math.max(1, n))) += math.abs(au.samples(i).toInt) / 32768f
              i += 1
            }
          case _ =>
            var i = 0
            while (i < a.bytes.length) { v((a.bytes(i) & 0xff) % d) += 1f; i += 1 }
        }
        val s = math.max(1e-9f, v.sum)
        AssetFeatures(a.assetId, a.kind, v.map(_ / s))
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

  /** Resize images to fit `maxDim`: REAL pixel-level nearest-neighbor
    * resample, re-encoded as P6 (decode → transform → re-encode, the full
    * column shape). Non-images pass through with metadata untouched.
    */
  def resize(decoded: Dataset[DecodedAsset], maxDim: Int): Dataset[DecodedAsset] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions { it =>
      it.map { a =>
        if (a.kind != "image") a
        else {
          val out = Ppm.resize(Ppm.decode(a.bytes), maxDim)
          a.copy(width = out.width, height = out.height, bytes = Ppm.encode(out))
        }
      }
    }
  }
}
