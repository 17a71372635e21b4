package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: assets are opaque `binary` columns with typed metadata, and
  * decode / feature-extraction / resize / frame-sampling run as batched
  * per-partition transforms (the Scala analog of `mapInPandas`: one
  * `mapPartitions` over a typed Dataset, amortizing codec setup across a
  * whole partition).
  *
  * Codecs — all REAL and pure-JVM (this container ships no media libs):
  * binary PPM (P6) images, RIFF/WAV PCM-16 audio, and RIFF/AVI video with
  * uncompressed BGR24 (`DIB `) frames — demux, per-frame decode to RGB,
  * and encode. Compressed video codecs (H.264 etc.) are out of scope: the
  * AVI container walk is general, but frame decode requires BI_RGB.
  */
object Multimodal {

  /** An asset row: media bytes + provenance. */
  final case class Asset(assetId: Long, kind: String, bytes: Array[Byte], source: String)

  /** Decoded metadata + the still-encoded payload.
    * Field mapping per kind — image: width×height pixels, frames=1;
    * audio: width=sampleRate, height=channels, frames=samples/channel;
    * video: width×height pixels per frame, frames=frame count.
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
      // copyOfRange would silently ZERO-PAD a truncated raster — reject it
      // loudly like every other malformed-input path in these codecs, or
      // downstream features/dedup compute over fabricated black pixels
      require(bytes.length >= i + w * h * 3,
        s"truncated P6 raster: need ${w * h * 3} bytes, have ${bytes.length - i}")
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

  /** Standalone JPEG/PNG still-image codec — the common multimodal input —
    * via the JDK's own javax.imageio (the same zero-dependency machinery
    * the AVI MJPG path uses; headless-safe). Decode re-emits a raw-RGB
    * [[Ppm.Image]], so every existing image operator (features, resize,
    * frame dedup) composes over bare JPEG/PNG columns unchanged; encode
    * goes back to PNG (lossless) or JPEG (lossy). [[decodeAny]] sniffs the
    * magic bytes, so an `image` column may mix all three formats freely.
    */
  object StillImage {
    /** Magic-byte sniff: `ppm` (P6), `jpeg` (FF D8 FF), `png` (89 'PNG'). */
    def format(bytes: Array[Byte]): Option[String] =
      if (bytes.length >= 2 && bytes(0) == 'P'.toByte && bytes(1) == '6'.toByte)
        Some("ppm")
      else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff)
        Some("jpeg")
      else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x89 &&
        bytes(1) == 'P'.toByte && bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte)
        Some("png")
      else None

    /** Top-down raw RGB of a decoded BufferedImage — the ONE imageio→RGB
      * pixel loop ([[decodeAny]] and Avi's MJPG frame decode both use it;
      * a colorspace/stride fix lands in one place). */
    private[functions] def rgbOf(img: java.awt.image.BufferedImage): Array[Byte] = {
      val w = img.getWidth; val h = img.getHeight
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val o = (y * w + x) * 3
          px(o) = ((p >> 16) & 0xff).toByte
          px(o + 1) = ((p >> 8) & 0xff).toByte
          px(o + 2) = (p & 0xff).toByte
          x += 1
        }
        y += 1
      }
      px
    }

    /** Decode any supported still format (P6 passes through its own
      * parser; JPEG/PNG via imageio) to top-down raw RGB. */
    def decodeAny(bytes: Array[Byte]): Ppm.Image = format(bytes) match {
      case Some("ppm") => Ppm.decode(bytes)
      case Some(_) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        require(img != null, "undecodable image bytes")
        Ppm.Image(img.getWidth, img.getHeight, rgbOf(img))
      case None => throw new IllegalArgumentException(
        "unrecognized image format (P6 PPM, JPEG, PNG supported)")
    }

    /** Encode raw RGB as `png` (lossless round-trip) or `jpg` (lossy) —
      * the ONE RGB→imageio loop (Avi's MJPG frame encode delegates here). */
    def encode(img: Ppm.Image, fmt: String = "png"): Array[Byte] = {
      require(Set("png", "jpg", "jpeg").contains(fmt), s"unsupported format $fmt")
      val bi = new java.awt.image.BufferedImage(
        img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val o = (y * img.width + x) * 3
          bi.setRGB(x, y,
            ((img.pixels(o) & 0xff) << 16) | ((img.pixels(o + 1) & 0xff) << 8) |
              (img.pixels(o + 2) & 0xff))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, fmt, bos)
      bos.toByteArray
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

  /** RIFF/AVI video codec, uncompressed bottom-up BGR24 frames (`DIB `
    * handler, `biCompression = 0`) — the classic Video-for-Windows layout,
    * fully demuxable and decodable in pure JVM:
    *
    * {{{
    * RIFF <sz> AVI
    *   LIST <sz> hdrl
    *     avih <56>            // MainAVIHeader: µs/frame, totalFrames, w, h …
    *     LIST <sz> strl
    *       strh <56>          // 'vids'/'DIB ' stream header, rate/scale
    *       strf <40>          // BITMAPINFOHEADER: 24bpp, BI_RGB
    *   LIST <sz> movi
    *     00db <len> <frame>   // rows bottom-up, BGR, 4-byte-aligned stride
    *     …
    * }}}
    *
    * [[Video.frames]] holds frames as top-down RGB (the orientation every
    * other operator here uses); encode/decode do the BGR/flip/stride
    * conversion. MJPG (`biCompression = 'MJPG'`, per-frame JPEG) is also
    * supported through the JDK's own javax.imageio — still zero external
    * libraries; [[encodeMjpeg]] writes it, [[decode]] handles both. Other
    * compressed codecs (H.264 etc.) are out of scope.
    */
  object Avi {
    final case class Video(width: Int, height: Int, fps: Int, frames: Vector[Array[Byte]])

    private def stride(w: Int): Int = (w * 3 + 3) & ~3
    private val MJPG = 0x47504a4d // fourcc "MJPG", little-endian

    private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1 // RIFF chunks are word-aligned
      val out = java.nio.ByteBuffer.allocate(8 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      out.array()
    }

    private def list(kind: String, listType: String, children: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + children.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(kind.getBytes("US-ASCII")).putInt(4 + children.length)
        .put(listType.getBytes("US-ASCII")).put(children)
      out.array()
    }

    /** Shared container assembly: headers parameterized by handler/
      * compression, `movi` from the given per-frame chunk payloads. */
    private def assemble(
        w: Int, h: Int, fps: Int, handler: String, compression: Int,
        bufSize: Int, frameChunkId: String,
        frameChunks: Iterator[Array[Byte]], nFrames: Int): Array[Byte] = {
      val le = java.nio.ByteOrder.LITTLE_ENDIAN
      val avih = java.nio.ByteBuffer.allocate(56).order(le)
      avih.putInt(1000000 / math.max(1, fps))   // µs per frame
        .putInt(bufSize * fps)                  // max bytes/sec
        .putInt(0).putInt(0)
        .putInt(nFrames)                        // total frames
        .putInt(0).putInt(1)                    // initial frames, streams
        .putInt(bufSize)                        // suggested buffer
        .putInt(w).putInt(h)
      val strh = java.nio.ByteBuffer.allocate(56).order(le)
      strh.put("vids".getBytes("US-ASCII")).put(handler.getBytes("US-ASCII"))
        .putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1).putInt(math.max(1, fps))     // scale, rate (fps = rate/scale)
        .putInt(0).putInt(nFrames)              // start, length
        .putInt(bufSize).putInt(-1).putInt(0)   // bufSize, quality, sampleSize
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      val strf = java.nio.ByteBuffer.allocate(40).order(le)
      strf.putInt(40).putInt(w).putInt(h)       // biSize, biWidth, biHeight (+: bottom-up)
        .putShort(1).putShort(24)               // planes, bpp
        .putInt(compression)
        .putInt(bufSize).putInt(0).putInt(0).putInt(0).putInt(0)
      val hdrl = list("LIST", "hdrl",
        chunk("avih", avih.array()) ++
          list("LIST", "strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
      // VfW convention: '00db' = uncompressed DIB frame, '00dc' =
      // compressed frame — our decoder accepts both, but strict external
      // parsers key behavior on the suffix (ADVICE r3)
      val movi = list("LIST", "movi",
        frameChunks.map(chunk(frameChunkId, _))
          .reduceOption(_ ++ _).getOrElse(Array.emptyByteArray))
      list("RIFF", "AVI ", hdrl ++ movi)
    }

    def encode(v: Video): Array[Byte] = {
      val w = v.width; val h = v.height; val st = stride(w)
      assemble(w, h, v.fps, "DIB ", 0, st * h, frameChunkId = "00db",
        v.frames.iterator.map { rgb =>
          require(rgb.length == w * h * 3, s"frame must be ${w * h * 3} bytes")
          val dib = new Array[Byte](st * h)
          var y = 0
          while (y < h) {
            val srcRow = y * w * 3          // top-down RGB in
            val dstRow = (h - 1 - y) * st   // bottom-up BGR out
            var x = 0
            while (x < w) {
              dib(dstRow + x * 3) = rgb(srcRow + x * 3 + 2)
              dib(dstRow + x * 3 + 1) = rgb(srcRow + x * 3 + 1)
              dib(dstRow + x * 3 + 2) = rgb(srcRow + x * 3)
              x += 1
            }
            y += 1
          }
          dib
        }, v.frames.length)
    }

    /** MJPG variant: each frame JPEG-encoded via the JDK's javax.imageio
      * (headless-safe, no external libraries). Lossy — round-trips to
      * approximately the input pixels. */
    def encodeMjpeg(v: Video): Array[Byte] = {
      val w = v.width; val h = v.height
      assemble(w, h, v.fps, "MJPG", MJPG, w * h * 3, frameChunkId = "00dc",
        v.frames.iterator.map { rgb =>
          require(rgb.length == w * h * 3, s"frame must be ${w * h * 3} bytes")
          // the same RGB→JPEG loop as a bare still image
          StillImage.encode(Ppm.Image(w, h, rgb), "jpg")
        }, v.frames.length)
    }

    def decode(bytes: Array[Byte]): Video = {
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      require(fourcc() == "RIFF", "not a RIFF file")
      buf.getInt
      require(fourcc() == "AVI ", "not an AVI file")
      var w = 0; var h = 0; var fps = 1
      var bpp = 0; var compression = -1
      val frames = Vector.newBuilder[Array[Byte]]
      def walk(end: Int): Unit = {
        while (buf.position() + 8 <= end) {
          val id = fourcc()
          val len = buf.getInt
          val next = buf.position() + len + (len & 1)
          id match {
            case "LIST" => buf.getInt /* list type */; walk(buf.position() + len - 4)
            case "avih" =>
              val micros = buf.getInt
              if (micros > 0) fps = math.max(1, (1000000.0 / micros).round.toInt)
              buf.getInt; buf.getInt; buf.getInt; buf.getInt; buf.getInt; buf.getInt
              buf.getInt
              w = buf.getInt; h = buf.getInt
            case "strf" =>
              buf.getInt; buf.getInt; buf.getInt; buf.getShort
              bpp = buf.getShort
              compression = buf.getInt
            case "00db" | "00dc" if compression == 0 =>
              require(bpp == 24, s"only 24bpp BI_RGB frames supported (bpp=$bpp)")
              val st = stride(w)
              require(len >= st * h, s"short frame chunk: $len < ${st * h}")
              val dib = new Array[Byte](st * h)
              buf.get(dib)
              val rgb = new Array[Byte](w * h * 3)
              var y = 0
              while (y < h) {
                val srcRow = (h - 1 - y) * st
                val dstRow = y * w * 3
                var x = 0
                while (x < w) {
                  rgb(dstRow + x * 3) = dib(srcRow + x * 3 + 2)
                  rgb(dstRow + x * 3 + 1) = dib(srcRow + x * 3 + 1)
                  rgb(dstRow + x * 3 + 2) = dib(srcRow + x * 3)
                  x += 1
                }
                y += 1
              }
              frames += rgb
            case "00db" | "00dc" if compression == MJPG =>
              val data = new Array[Byte](len)
              buf.get(data)
              val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))
              require(img != null, "undecodable MJPG frame")
              require(img.getWidth == w && img.getHeight == h,
                s"MJPG frame ${img.getWidth}x${img.getHeight} != header ${w}x$h")
              frames += StillImage.rgbOf(img) // the same imageio→RGB loop
            case "00db" | "00dc" =>
              // compression == -1 means no strf was parsed before this
              // frame chunk: a structural problem (movi before strl, or a
              // missing strf), not an unknown codec (ADVICE r3)
              if (compression == -1)
                throw new IllegalArgumentException(
                  "malformed AVI: frame chunk before any strf header (missing/out-of-order strf)")
              throw new IllegalArgumentException(
                f"unsupported video codec: biCompression=0x$compression%08x (BI_RGB and MJPG supported)")
            case _ => // skip idx1, JUNK, strn, …
          }
          buf.position(next)
        }
      }
      walk(bytes.length)
      require(w > 0 && h > 0, "no avih header")
      Video(w, h, fps, frames.result())
    }
  }

  /** Synthesize a deterministic asset table: REAL P6 images (gradient +
    * id-seeded noise), REAL PCM16 WAVs (id-pitched sine), REAL BGR24 AVIs
    * (per-frame deterministic gradient animation).
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
          val w = 16 + (id % 16).toInt; val h = 12 + (id % 12).toInt
          val f = 2 + (id % 12).toInt
          val frames = Vector.tabulate(f) { t =>
            Array.tabulate(w * h * 3) { i =>
              ((i + t * 7 + id * 31) % 251).toByte
            }
          }
          Asset(id, "video", Avi.encode(Avi.Video(w, h, 10, frames)), s"synth://$id")
      }
    }
  }

  /** Decode metadata for every asset — batched per partition so codec init
    * is paid once per task, not per row. All three kinds go through the
    * REAL parsers.
    */
  def decode(assets: Dataset[Asset]): Dataset[DecodedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        a.kind match {
          case "image" =>
            // sniffing handles P6/JPEG/PNG uniformly in one column
            val img = StillImage.decodeAny(a.bytes)
            DecodedAsset(a.assetId, a.kind, img.width, img.height, 1, a.bytes)
          case "audio" =>
            val au = Wav.decode(a.bytes)
            DecodedAsset(a.assetId, a.kind, au.sampleRate, au.channels,
              au.samples.length / au.channels, a.bytes)
          case _ =>
            val v = Avi.decode(a.bytes)
            DecodedAsset(a.assetId, a.kind, v.width, v.height, v.frames.length, a.bytes)
        }
      }
    }
  }

  /** Extract a fixed-size feature vector (dim `d`, L1-normalized) per asset:
    * images → luminance histogram over REAL decoded pixels; audio → per-bin
    * mean |amplitude| over REAL decoded samples; video → luminance
    * histogram over the REAL decoded frames.
    */
  def features(decoded: Dataset[DecodedAsset], d: Int = 16): Dataset[AssetFeatures] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions { it =>
      it.map { a =>
        val v = new Array[Float](d)
        a.kind match {
          case "image" =>
            val img = StillImage.decodeAny(a.bytes)
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
            val vid = Avi.decode(a.bytes)
            vid.frames.foreach { rgb =>
              var i = 0
              while (i + 2 < rgb.length) {
                val lum = ((rgb(i) & 0xff) * 299 + (rgb(i + 1) & 0xff) * 587 +
                  (rgb(i + 2) & 0xff) * 114) / 1000
                v(lum * d / 256) += 1f
                i += 3
              }
            }
        }
        val s = math.max(1e-9f, v.sum)
        AssetFeatures(a.assetId, a.kind, v.map(_ / s))
      }
    }
  }

  /** Sample up to `k` evenly-spaced REAL frames from each video: demux the
    * AVI, decode the chosen frames to RGB, and emit each as a P6 image —
    * so every downstream IMAGE operator (features, resize, dedup)
    * composes directly over sampled frames. Output one row per
    * (assetId, frameIdx, frameBytes).
    */
  def sampleFrames(decoded: Dataset[DecodedAsset], k: Int = 4): DataFrame = {
    import decoded.sparkSession.implicits._
    decoded.filter(_.kind == "video").flatMap { a =>
      val v = Avi.decode(a.bytes)
      // a zero-frame video (valid empty movi list) emits zero rows — the
      // old max(1, …) guard protected the division but then indexed
      // frames(0) on the empty vector, failing the whole task
      val frames = v.frames.length
      val take = math.min(k, frames)
      (0 until take).map { i =>
        val fi = (i.toLong * frames / take).toInt
        (a.assetId, fi, Ppm.encode(Ppm.Image(v.width, v.height, v.frames(fi))))
      }
    }.toDF("assetId", "frameIdx", "frameBytes")
  }

  /** Resize images to fit `maxDim`: REAL pixel-level nearest-neighbor
    * resample, re-encoded as P6 (decode → transform → re-encode, the full
    * column shape; JPEG/PNG inputs normalize to P6 on the way through).
    * Non-images pass through with metadata untouched.
    */
  def resize(decoded: Dataset[DecodedAsset], maxDim: Int): Dataset[DecodedAsset] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions { it =>
      it.map { a =>
        if (a.kind != "image") a
        else {
          val out = Ppm.resize(StillImage.decodeAny(a.bytes), maxDim)
          a.copy(width = out.width, height = out.height, bytes = Ppm.encode(out))
        }
      }
    }
  }
}
