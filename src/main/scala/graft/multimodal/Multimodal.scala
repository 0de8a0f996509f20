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
  * The image and audio kernels are REAL, JDK-only codecs: `javax.imageio`
  * decodes/encodes PNG, BMP, GIF and JPEG, and `javax.sound.sampled`
  * parses WAV/AIFF/AU headers — no external libraries. Only video remains
  * plumbing-only (`sampleFrames` emits the frame-index explode shape a
  * real demuxer would fill): the JDK ships no video codec, so video
  * payloads stay opaque and decode as (0, 0) / zero features.
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

  /** Frame sampling plumbing for video: emit one row per sampled frame
    * index — the explode shape a real demuxer would fill with frame bytes
    * (the JDK ships no video codec; this is the one remaining stub). */
  def sampleFrames(df: DataFrame, everyNthFrame: Int, totalFramesCol: String): DataFrame =
    df.withColumn(
      "frame_index",
      explode(sequence(lit(0), greatest(col(totalFramesCol) - 1, lit(0)), lit(everyNthFrame))))

  /** Deterministic REAL-payload media table: for id i,
    *  - i % 3 == 0 → a solid-gray image, format png/bmp/gif by (i/3) % 3,
    *    width 8 + (i/3 % 5)·4, height 6 + (i/3 % 3)·2, gray (i·7) % 256;
    *  - i % 3 == 1 → a silent WAV of 1024·(1 + i % 5) frames at 8192 Hz
    *    (duration (1 + i % 5)/8 s — dyadic, so double math is exact);
    *  - i % 3 == 2 → an opaque pseudo-video payload (md5 bytes; no JDK
    *    video codec exists, and undecodable rows are part of the contract).
    * Every decoded property is a closed-form function of i, which is what
    * lets q33's oracle recompute the expected aggregates analytically in
    * SQL, independent of the codec. Payload generation runs on executors
    * (mapPartitions over a range), never on the driver. */
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
          case _ =>
            val md = java.security.MessageDigest.getInstance("MD5")
            (md.digest(i.toString.getBytes("UTF-8")), "video", "mp4")
        }
        Row(i, payload, mediaType, format, payload.length.toLong)
      }
    }(enc)
  }
}
