package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns next to typed metadata, and per-batch transforms run as
  * partition-local iterators (`mapPartitions`) — the Scala analogue of
  * `mapInPandas` batch UDFs. No shuffle anywhere: every decode is a pure
  * per-row function, so at 100 TB this runs at scan speed with the codec
  * as the only cost.
  *
  * The image, audio AND video kernels are REAL, JDK-only codecs:
  * `javax.imageio` decodes/encodes PNG, BMP, GIF and JPEG;
  * `javax.sound.sampled` parses WAV/AIFF/AU headers; and the AVI container
  * with uncompressed BI_RGB frames is demuxed natively (RIFF chunk
  * framing — `Codec.videoInfo` / `videoFrameMeans`). Compressed video
  * streams (mp4/h264 — no JDK codec exists) stay opaque and decode as
  * zero frames: undecodable rows are data, not errors.
  */
object Multimodal {

  /** Typed metadata carried beside the binary payload. */
  case class MediaMeta(
      mediaType: String, // "image" | "audio" | "video"
      format: String, // "png", "wav", ...
      sizeBytes: Long)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("size_bytes", LongType, nullable = false)))

  /** JDK-only media codec. Decode failures are data, not errors: a payload
    * that is not a decodable image yields (0, 0) dims / zero features, and
    * a payload that is not decodable audio yields 0.0 seconds — at corpus
    * scale undecodable rows are routine and must not kill the job. */
  object Codec {
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO
    import java.awt.image.BufferedImage

    // never spill decode scratch to temp files on executors
    ImageIO.setUseCache(false)

    /** Header-only (width, height) via ImageReader — O(1), no pixel
      * decode, which is what you want when scanning 100 TB for dims. */
    def imageDims(payload: Array[Byte]): (Int, Int) = {
      if (payload == null || payload.isEmpty) return (0, 0)
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) (0, 0)
        else {
          val r = readers.next()
          try { r.setInput(iis); (r.getWidth(0), r.getHeight(0)) }
          catch { case _: java.io.IOException => (0, 0) }
          finally r.dispose()
        }
      } finally iis.close()
    }

    /** Full pixel decode; None for anything ImageIO cannot read. */
    def decodeImage(payload: Array[Byte]): Option[BufferedImage] =
      if (payload == null || payload.isEmpty) None
      else
        try Option(ImageIO.read(new ByteArrayInputStream(payload)))
        catch { case _: java.io.IOException => None }

    /** Mean-luminance block features on a g×g grid (g = sqrt(dim)): the
      * image is split into dim blocks and each feature is that block's
      * mean luminance ((r+g+b)/3) normalized by 256. The 256 normalizer
      * (not 255) is deliberate: integer gray levels become exact dyadic
      * floats, so the q33 oracle can reproduce values bit-for-bit in SQL.
      * Non-image payloads → all-zero vector. */
    def blockFeatures(payload: Array[Byte], dim: Int = 16): Array[Float] = {
      val out = new Array[Float](dim)
      val g = math.sqrt(dim.toDouble).toInt
      require(g * g == dim, s"blockFeatures dim must be a perfect square, got $dim")
      decodeImage(payload).foreach { img =>
        val w = img.getWidth
        val h = img.getHeight
        var by = 0
        while (by < g) {
          var bx = 0
          while (bx < g) {
            // block pixel range; degenerate blocks (image smaller than the
            // grid) clamp to at least one pixel
            val x0 = bx * w / g; val x1 = math.min(w, math.max(x0 + 1, (bx + 1) * w / g))
            val y0 = by * h / g; val y1 = math.min(h, math.max(y0 + 1, (by + 1) * h / g))
            var sum = 0.0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
                x += 1
              }
              y += 1
            }
            out(by * g + bx) = (sum / ((x1 - x0).toLong * (y1 - y0)) / 256.0).toFloat
            bx += 1
          }
          by += 1
        }
      }
      out
    }

    /** 64-bit average hash (aHash): 8×8 block mean-luminances, bit
      * `by*8+bx` set iff that block's mean is STRICTLY above the mean of
      * all 64 — the classic perceptual fingerprint (robust to resize and
      * brightness-preserving re-encodes; a solid image hashes to 0).
      * None for payloads that do not decode as images. */
    def aHash64(payload: Array[Byte]): Option[Long] =
      decodeImage(payload).map { _ =>
        val f = blockFeatures(payload, 64)
        var s = 0.0
        var i = 0
        while (i < 64) { s += f(i); i += 1 }
        val mean = s / 64.0
        var h = 0L
        i = 0
        while (i < 64) {
          if (f(i) > mean) h |= (1L << i)
          i += 1
        }
        h
      }

    /** Horizontal-gradient grayscale image: pixel value base + x*step on
      * every row (caller keeps base + (width−1)·step within 0..255 — no
      * clipping, so block means stay exactly linear in the column). */
    def gradientImage(width: Int, height: Int, base: Int, step: Int, format: String): Array[Byte] = {
      require(base >= 0 && base + (width - 1) * step <= 255,
        s"gradientImage: gradient $base..${base + (width - 1) * step} leaves 0..255")
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = base + x * step
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, format, bos)
      bos.toByteArray
    }

    /** Real bilinear resize, re-encoded as PNG; null for non-images. */
    def resizePng(payload: Array[Byte], width: Int, height: Int): Array[Byte] =
      decodeImage(payload).map { img =>
        val dst = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
        val g2 = dst.createGraphics()
        try {
          g2.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(img, 0, 0, width, height, null)
        } finally g2.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        ImageIO.write(dst, "png", bos)
        bos.toByteArray
      }.orNull

    /** Duration in seconds from the audio header (WAV/AIFF/AU — the
      * formats `javax.sound.sampled` parses); 0.0 for non-audio. */
    def audioSeconds(payload: Array[Byte]): Double = {
      if (payload == null || payload.isEmpty) return 0.0
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(payload))
        try ais.getFrameLength.toDouble / ais.getFormat.getFrameRate.toDouble
        finally ais.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => 0.0
        case _: java.io.IOException => 0.0
      }
    }

    /** Solid-gray image encoded as `format` ("png" | "bmp" | "gif") — the
      * deterministic fixture generator behind `syntheticMedia`. Solid
      * images survive any lossless codec and palette quantization exactly,
      * which keeps every derived feature analytic. */
    def solidGrayImage(width: Int, height: Int, gray: Int, format: String): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      val rgb = (gray << 16) | (gray << 8) | gray
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, format, bos)
      bos.toByteArray
    }

    /** Silent 16-bit mono PCM WAV at 8192 Hz — `frames`/8192 seconds, a
      * dyadic value whenever frames is a multiple of a power of two. */
    def silentWav(frames: Int): Array[Byte] = {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      val fmt = new AudioFormat(8192f, 16, 1, true, false)
      val data = new Array[Byte](frames * 2)
      val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** 16-bit mono little-endian PCM WAV at 8192 Hz with the given
      * per-frame sample values (clamped to short range) — the payload
      * generator behind `syntheticAudioCorpus`. Constant-valued segments
      * survive the PCM round-trip exactly, keeping derived energies
      * analytic (the solid-gray-image move, in audio). */
    def pcmWav(samples: Array[Int]): Array[Byte] = {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      val fmt = new AudioFormat(8192f, 16, 1, true, false)
      val data = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        val s = math.max(Short.MinValue.toInt, math.min(Short.MaxValue.toInt, samples(i)))
        data(2 * i) = (s & 0xff).toByte
        data(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode a 16-bit mono little-endian PCM payload back to its exact
      * integer samples via the JDK sampled-audio stack; None for anything
      * that is not that format (opaque payloads are data, not errors). */
    def wavSamples(payload: Array[Byte]): Option[Array[Int]] = {
      if (payload == null || payload.isEmpty) return None
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(payload))
        try {
          val f = ais.getFormat
          if (f.getSampleSizeInBits != 16 || f.getChannels != 1 || f.isBigEndian ||
              f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
          else {
            val bytes = ais.readAllBytes()
            val out = new Array[Int](bytes.length / 2)
            var i = 0
            while (i < out.length) {
              out(i) = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
              i += 1
            }
            Some(out)
          }
        } finally ais.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
    }

    // ---- AVI container (RIFF) — pure-JVM video path ------------------
    //
    // The JDK ships no compressed video codec, but the AVI *container* with
    // uncompressed BI_RGB ("DIB ") frames is just RIFF chunk framing — a
    // format every ffmpeg-era tool reads and writes (`-c:v rawvideo`). That
    // makes real, oracle-checkable video plumbing possible with zero
    // dependencies: parse the header for stream metadata, walk the `movi`
    // list for frames, and read raw bottom-up BGR pixel rows. Compressed
    // streams (anything with a non-zero biCompression) still decode as
    // "no frames" — opaque payloads remain data, not errors.

    private def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    /** Video stream metadata: (width, height, fps, nFrames) from the AVI
      * main header + a `movi` frame-chunk walk; None for anything that is
      * not an uncompressed-DIB AVI. */
    def videoInfo(payload: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      if (payload == null || payload.length < 24) return None
      try {
        if (tag(payload, 0) != "RIFF" || tag(payload, 8) != "AVI ") return None
        var w = 0; var h = 0; var usec = 0; var compression = -1
        var frames = 0
        def walk(start: Int, end: Int): Unit = {
          var off = start
          while (off + 8 <= end) {
            val id = tag(payload, off)
            val sz = le32(payload, off + 4)
            if (sz < 0 || off + 8 + sz > end) return
            id match {
              case "LIST" =>
                walk(off + 12, off + 8 + sz) // skip the 4-byte list type
              case "avih" if sz >= 40 =>
                usec = le32(payload, off + 8)
                w = le32(payload, off + 8 + 32)
                h = le32(payload, off + 8 + 36)
              case "strf" if sz >= 40 =>
                compression = le32(payload, off + 8 + 16)
              case c if c.endsWith("db") || c.endsWith("dc") =>
                frames += 1
              case _ => ()
            }
            off += 8 + sz + (sz & 1) // chunks pad to even
          }
        }
        walk(12, payload.length)
        if (w <= 0 || h <= 0 || usec <= 0 || compression != 0) None
        else Some((w, h, (1000000 + usec / 2) / usec, frames))
      } catch { case _: IndexOutOfBoundsException => None }
    }

    /** Demux every `everyNth`-th frame and return (frameIndex,
      * meanLuminance/256) — the mean over the frame's pixel channel bytes,
      * row padding excluded. Non-AVI payloads → empty. */
    def videoFrameMeans(payload: Array[Byte], everyNth: Int): Seq[(Int, Double)] = {
      require(everyNth > 0, "everyNth must be positive")
      videoInfo(payload) match {
        case None => Seq.empty
        case Some((w, h, _, _)) =>
          // long arithmetic: a hostile header can declare dwWidth ~2^31/3,
          // overflowing an int stride into a negative that defeats the size
          // guard below — the 'undecodable rows are data' contract must
          // survive adversarial headers, not just well-formed ones
          val stride = ((w.toLong * 3 + 3) / 4) * 4
          val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
          var frame = 0
          def walk(start: Int, end: Int): Unit = {
            var off = start
            while (off + 8 <= end) {
              val id = tag(payload, off)
              val sz = le32(payload, off + 4)
              if (sz < 0 || off + 8 + sz > end) return
              if (id == "LIST") walk(off + 12, off + 8 + sz)
              else if (id.endsWith("db") || id.endsWith("dc")) {
                if (frame % everyNth == 0 && sz.toLong >= stride * h) {
                  var sum = 0L
                  var y = 0
                  while (y < h) {
                    val row = off + 8 + y * stride.toInt
                    var x = 0
                    while (x < w * 3) { sum += payload(row + x) & 0xff; x += 1 }
                    y += 1
                  }
                  out += ((frame, sum.toDouble / (w.toLong * h * 3) / 256.0))
                }
                frame += 1
              }
              off += 8 + sz + (sz & 1)
            }
          }
          try walk(12, payload.length)
          catch { case _: IndexOutOfBoundsException => () } // truncated frame data → keep what parsed
          out.toSeq
      }
    }

    /** Minimal uncompressed-DIB AVI writer: one video stream, `fps`
      * frames/s, each frame solid gray `frameGrays(j)` — closed-form
      * frames keep every decoded property analytic for the oracle while
      * exercising the full container round-trip. */
    def solidGrayAvi(width: Int, height: Int, fps: Int, frameGrays: Seq[Int]): Array[Byte] = {
      require(width > 0 && height > 0 && fps > 0)
      val stride = ((width * 3 + 3) / 4) * 4
      val frameSize = stride * height
      val bos = new java.io.ByteArrayOutputStream()
      def s4(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
      def i4(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff); bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff) }
      def i2(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      val n = frameGrays.length
      val strlSize = 4 + 8 + 56 + 8 + 40
      val hdrlSize = 4 + 8 + 56 + 8 + strlSize
      val moviSize = 4 + n * (8 + frameSize)
      val riffSize = 4 + 8 + hdrlSize + 8 + moviSize
      s4("RIFF"); i4(riffSize); s4("AVI ")
      s4("LIST"); i4(hdrlSize); s4("hdrl")
      s4("avih"); i4(56)
      i4(1000000 / fps); i4(frameSize * fps); i4(0); i4(0x10) // AVIF_HASINDEX off, AVIF_WASCAPTUREFILE off; 0x10 = AVIF_ISINTERLEAVED
      i4(n); i4(0); i4(1); i4(frameSize); i4(width); i4(height)
      i4(0); i4(0); i4(0); i4(0)
      s4("LIST"); i4(strlSize); s4("strl")
      s4("strh"); i4(56)
      s4("vids"); s4("DIB "); i4(0); i2(0); i2(0); i4(0)
      i4(1); i4(fps); i4(0); i4(n); i4(frameSize); i4(-1); i4(0)
      i2(0); i2(0); i2(width); i2(height)
      s4("strf"); i4(40)
      i4(40); i4(width); i4(height); i2(1); i2(24); i4(0) // BI_RGB
      i4(frameSize); i4(0); i4(0); i4(0); i4(0)
      s4("LIST"); i4(moviSize); s4("movi")
      frameGrays.foreach { gray =>
        s4("00db"); i4(frameSize)
        val row = new Array[Byte](stride)
        java.util.Arrays.fill(row, 0, width * 3, (gray & 0xff).toByte)
        var y = 0
        while (y < height) { bos.write(row); y += 1 }
      }
      bos.toByteArray
    }
  }

  /** Decode image metadata: binary payload → (width, height) columns.
    * Partition-local, no shuffle; header-only reads (no pixel decode). */
  def decodeImageDims(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = Codec.imageDims(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq ++ Seq(w, h))
      }
    }(enc)
  }

  /** Decode audio metadata: binary payload → duration-seconds column
    * (0.0 for anything that is not header-parseable audio). */
  def decodeAudioSeconds(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("audio_seconds", DoubleType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ Codec.audioSeconds(r.getAs[Array[Byte]](idx))))
    }(enc)
  }

  /** Feature extraction: payload → fixed-dim float array of block
    * mean-luminances (joins the embedding pipeline in graft.ml.Similarity
    * downstream); zero vector for non-images. */
  def extractFeatures(df: DataFrame, payloadCol: String = "payload", dim: Int = 16): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val f = Codec.blockFeatures(r.getAs[Array[Byte]](idx), dim)
        Row.fromSeq(r.toSeq :+ f.toSeq)
      }
    }(enc)
  }

  /** Perceptual image hashing: payload → 64-bit aHash column (`ahash`,
    * null for non-images). Partition-local decode, no shuffle — the hash
    * is the 8-byte artifact that joins the dedup family downstream
    * (exact groupBy for identical-content groups, [[graft.text.Dedup
    * .hammingDistance]] banding for near-dups), so 100 TB of pixels
    * reduce to a long per image before anything wide happens. */
  def imageAHashes(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("ahash", LongType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val h = Codec.aHash64(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq :+ h.map(java.lang.Long.valueOf).orNull)
      }
    }(enc)
  }

  /** Real image resize: payload → bilinear-resampled PNG payload + target
    * dims. Non-image payloads resize to null (schema keeps the row). */
  def resizeImages(
      df: DataFrame,
      targetWidth: Int,
      targetHeight: Int,
      payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("resized_payload", BinaryType),
      StructField("resized_width", IntegerType),
      StructField("resized_height", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val resized = Codec.resizePng(r.getAs[Array[Byte]](idx), targetWidth, targetHeight)
        Row.fromSeq(r.toSeq ++ Seq(resized, targetWidth, targetHeight))
      }
    }(enc)
  }

  /** Frame-index sampling over an already-known frame count: emit one row
    * per sampled index. The metadata-only path — use [[sampleVideoFrames]]
    * when the payload itself must be demuxed. */
  def sampleFrames(df: DataFrame, everyNthFrame: Int, totalFramesCol: String): DataFrame =
    df.withColumn(
      "frame_index",
      explode(sequence(lit(0), greatest(col(totalFramesCol) - 1, lit(0)), lit(everyNthFrame))))

  /** Decode video stream metadata: payload → (video_width, video_height,
    * video_fps, video_frames); zeros for anything that is not an
    * uncompressed-DIB AVI. Header walk only — no pixel reads. */
  def decodeVideoInfo(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("video_width", IntegerType), StructField("video_height", IntegerType),
      StructField("video_fps", IntegerType), StructField("video_frames", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, fps, n) = Codec.videoInfo(r.getAs[Array[Byte]](idx)).getOrElse((0, 0, 0, 0))
        Row.fromSeq(r.toSeq ++ Seq(w, h, fps, n))
      }
    }(enc)
  }

  /** REAL frame sampling: demux every nth frame from the AVI payload and
    * emit one row per sampled frame with its mean luminance (pixel channel
    * bytes / 256 — dyadic-exact for integer grays). Undecodable payloads
    * emit zero rows; partition-local flatMap, no shuffle. */
  def sampleVideoFrames(
      df: DataFrame,
      everyNthFrame: Int,
      payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_index", IntegerType),
      StructField("frame_mean", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        Codec.videoFrameMeans(r.getAs[Array[Byte]](idx), everyNthFrame).map {
          // Seq[Any], not Seq(fi, mean): weak conformance would unify the
          // mixed Int/Double to Seq[Double] and silently box fi as a Double
          case (fi, mean) => Row.fromSeq(r.toSeq ++ Seq[Any](fi, mean))
        }
      }
    }(enc)
  }

  /** Deterministic REAL-payload media table: for id i,
    *  - i % 3 == 0 → a solid-gray image, format png/bmp/gif by (i/3) % 3,
    *    width 8 + (i/3 % 5)·4, height 6 + (i/3 % 3)·2, gray (i·7) % 256;
    *  - i % 3 == 1 → a silent WAV of 1024·(1 + i % 5) frames at 8192 Hz
    *    (duration (1 + i % 5)/8 s — dyadic, so double math is exact);
    *  - i % 3 == 2 and i even → a REAL uncompressed-DIB AVI, width
    *    16 + (i/3 % 3)·8, height 12, 8 fps, 2 + (i/3 % 4) frames, frame j
    *    solid gray (i·11 + j·31) % 256;
    *  - i % 3 == 2 and i odd → an opaque pseudo-mp4 payload (md5 bytes;
    *    undecodable rows are part of the contract).
    * Every decoded property is a closed-form function of i, which is what
    * lets q33's oracle recompute the expected aggregates analytically in
    * SQL, independent of the codec. Payload generation runs on executors
    * (mapPartitions over a range), never on the driver. */
  /** Synthetic image corpus for the perceptual-hash pipeline: even ids
    * are horizontal gradients (varying base brightness, SAME spatial
    * structure — one aHash class by construction), odd ids solid grays
    * (aHash 0). Distributed generation, every property analytic in the
    * id — the oracle derives expected hashes from the arithmetic, never
    * from the codec. */
  def syntheticImages(spark: SparkSession, n: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("payload", BinaryType))))
    spark.range(n.toLong).toDF("id").mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        val payload =
          if (i % 2 == 0) Codec.gradientImage(16, 16, (20 + (i * 5) % 100).toInt, 3, "png")
          else Codec.solidGrayImage(12, 12, ((i * 7) % 256).toInt, "png")
        Row(i, payload)
      }
    }(enc)
  }

  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    spark.range(n.toLong).toDF("id").mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        val (payload, mediaType, format) = (i % 3) match {
          case 0 =>
            val sub = (i / 3).toInt
            val fmt = Seq("png", "bmp", "gif")(sub % 3)
            val w = 8 + (sub % 5) * 4
            val h = 6 + (sub % 3) * 2
            (Codec.solidGrayImage(w, h, ((i * 7) % 256).toInt, fmt), "image", fmt)
          case 1 =>
            (Codec.silentWav(1024 * (1 + (i % 5).toInt)), "audio", "wav")
          case _ if i % 6 == 2 =>
            // real uncompressed-DIB AVI: frame j is solid gray
            // (i·11 + j·31) % 256 — every demuxed property stays analytic
            val sub = (i / 3).toInt
            val w = 16 + (sub % 3) * 8
            val n = 2 + (sub % 4)
            val grays = (0 until n).map(j => ((i * 11 + j * 31) % 256).toInt)
            (Codec.solidGrayAvi(w, 12, 8, grays), "video", "avi")
          case _ =>
            // opaque compressed-codec stand-in: undecodable payloads are
            // routine at corpus scale and must flow through as data
            val md = java.security.MessageDigest.getInstance("MD5")
            (md.digest(i.toString.getBytes("UTF-8")), "video", "mp4")
        }
        Row(i, payload, mediaType, format, payload.length.toLong)
      }
    }(enc)
  }

  /** Synthetic video corpus with near-duplicates BY CONSTRUCTION, for the
    * frame-signature dedup pipeline (q211): video v belongs to group
    * g = v/3 with canonical 6-frame gray sequence `(g·17 + j·23) % 256`;
    * variant v%3 == 0 is the canonical cut, 1 re-renders only the LAST
    * frame (+101 — a near-duplicate: same footage, new outro), 2 shifts
    * every frame (+101 — different footage). Real uncompressed-DIB AVI
    * payloads (the q95 demuxer must recover every gray exactly); every
    * frame value stays a closed-form function of (v, j), so the oracle
    * derives expected similarities from the arithmetic, never from the
    * codec. Generation runs on executors. */
  def syntheticVideoCorpus(spark: SparkSession, n: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("payload", BinaryType))))
    spark.range(n.toLong).toDF("id").mapPartitions { rows =>
      rows.map { r =>
        val v = r.getLong(0)
        val g = v / 3
        val grays = (0 until 6).map { j =>
          val offset = if (v % 3 == 2 || (v % 3 == 1 && j == 5)) 101L else 0L
          ((g * 17 + j * 23 + offset) % 256).toInt
        }
        Row(v, Codec.solidGrayAvi(16, 12, 8, grays))
      }
    }(enc)
  }

  /** REAL audio envelope extraction: demux the PCM samples and emit one
    * row per `framesPerSegment`-frame segment with its absolute-amplitude
    * energy sum (exact BIGINT — constant-segment payloads make it
    * analytic). Undecodable payloads emit zero rows; partition-local
    * flatMap, no shuffle — the map-side front half of the audio dedup
    * pipeline, mirroring `sampleVideoFrames`. */
  def audioSegmentEnergies(
      df: DataFrame,
      framesPerSegment: Int,
      payloadCol: String = "payload"): DataFrame = {
    require(framesPerSegment >= 1, s"audioSegmentEnergies: framesPerSegment $framesPerSegment must be >= 1")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("segment_index", IntegerType),
      StructField("energy", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        Codec.wavSamples(r.getAs[Array[Byte]](idx)).toSeq.flatMap { samples =>
          samples.grouped(framesPerSegment).zipWithIndex.collect {
            // ragged tails are dropped: only FULL segments are comparable
            // fingerprint units across payloads
            case (seg, si) if seg.length == framesPerSegment =>
              var e = 0L
              var i = 0
              while (i < seg.length) { e += math.abs(seg(i).toLong); i += 1 }
              Row.fromSeq(r.toSeq ++ Seq[Any](si, e))
          }
        }
      }
    }(enc)
  }

  /** Synthetic audio corpus for the envelope-fingerprint dedup pipeline
    * (q223): base clip a (a in [0, n)) has 12 constant-amplitude segments
    * of 200 frames, amplitude amp(a, k) = 500 + a·16 + k — injective in
    * (a, k), so distinct clips share NO segment energies; every a with
    * a % 5 == 0 also ships a near-duplicate clone (id n + a) identical
    * except segment 0, whose amplitude moves to 7500 + a·16 (outside the
    * base range — collision-free). Real PCM WAV payloads, every energy a
    * closed-form function of the ids: the oracle derives expected
    * similarities from the arithmetic, never from the codec. Generation
    * runs on executors. */
  def syntheticAudioCorpus(spark: SparkSession, n: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("payload", BinaryType))))
    val ids = spark.range(n.toLong).toDF("id")
      .union(spark.range(n.toLong).filter(col("id") % 5 === 0)
        .select((col("id") + n.toLong).as("id")))
    ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val a = if (id >= n) id - n else id
        val samples = (0 until 12).flatMap { k =>
          val amp =
            if (id >= n && k == 0) 7500 + a.toInt * 16
            else 500 + a.toInt * 16 + k
          Seq.fill(200)(amp)
        }.toArray
        Row(id, Codec.pcmWav(samples))
      }
    }(enc)
  }
}
