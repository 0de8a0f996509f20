package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns next to typed metadata, and per-batch transforms run as
  * partition-local iterators (`mapPartitions`) — the Scala analogue of
  * `mapInPandas` batch UDFs.
  *
  * The actual decode/resize/frame-sample kernels are STUBS (this container
  * ships no image/audio codecs): `FakeCodec` derives deterministic features
  * from the bytes so the Spark-side plumbing — schema, batching,
  * partitioning, column shapes — is real and testable end-to-end. Swap
  * `FakeCodec` for a JNI/javacv codec in production.
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

  /** STUB codec: deterministic pseudo-decode. Every derived feature is a
    * pure function of the payload bytes, so tests are reproducible. A real
    * implementation would decode with an image/audio library here — the
    * function signature (bytes in, fixed-schema features out) is the
    * production contract. */
  object FakeCodec {
    def imageDims(payload: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      (256 + math.abs(h % 1024), 256 + math.abs((h / 1024) % 1024))
    }
    def audioSeconds(payload: Array[Byte]): Double =
      1.0 + math.abs(java.util.Arrays.hashCode(payload) % 600) / 10.0
    /** Deterministic byte resample to `n` bytes (production: real image
      * scaling). Zero-length payloads resample to zero-length. */
    def resample(payload: Array[Byte], n: Int): Array[Byte] = {
      if (payload.isEmpty) return Array.emptyByteArray
      val out = new Array[Byte](n)
      var j = 0
      while (j < n) {
        out(j) = payload(((j.toLong * payload.length) / n).toInt % payload.length)
        j += 1
      }
      out
    }
    /** Fixed-length feature vector (production: CNN embedding). */
    def features(payload: Array[Byte], dim: Int = 16): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      var h = 1125899906842597L
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      var j = 0
      while (j < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(j) = ((h >>> 16) % 10000) / 10000.0f
        j += 1
      }
      out
    }
  }

  /** Decode image metadata: binary payload → (width, height) columns.
    * Partition-local, no shuffle; batches stream through the iterator
    * without materializing the partition. */
  def decodeImageDims(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val (w, h) = if (payload == null) (0, 0) else FakeCodec.imageDims(payload)
        Row.fromSeq(r.toSeq ++ Seq(w, h))
      }
    }(enc)
  }

  /** Feature extraction: payload → fixed-dim float array (joins the
    * embedding pipeline in graft.ml.Similarity downstream). */
  def extractFeatures(df: DataFrame, payloadCol: String = "payload", dim: Int = 16): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val f = if (payload == null) new Array[Float](dim) else FakeCodec.features(payload, dim)
        Row.fromSeq(r.toSeq :+ f.toSeq)
      }
    }(enc)
  }

  /** Resize plumbing: payload → resized payload + target dims. The stub
    * "resample" is a deterministic byte fold down/up to a size proportional
    * to the target area — the production contract (bytes in, bytes out,
    * fixed target dims) is what downstream code depends on. */
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
        val payload = r.getAs[Array[Byte]](idx)
        val resized =
          if (payload == null) null
          else FakeCodec.resample(payload, math.max(1, targetWidth * targetHeight / 65536))
        Row.fromSeq(r.toSeq ++ Seq(resized, targetWidth, targetHeight))
      }
    }(enc)
  }

  /** Frame sampling plumbing for video: emit one row per sampled frame
    * index — the explode shape a real decoder would fill with frame bytes. */
  def sampleFrames(df: DataFrame, everyNthFrame: Int, totalFramesCol: String): DataFrame =
    df.withColumn(
      "frame_index",
      explode(sequence(lit(0), greatest(col(totalFramesCol) - 1, lit(0)), lit(everyNthFrame))))

  /** Build a demo media table from any binary-free source by packing a
    * deterministic payload — lets the pipeline be exercised without codecs. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      // deterministic bytes derived from the id
      unhex(md5(col("id").cast("string"))).as("payload"),
      when(col("id") % 3 === 0, "image").when(col("id") % 3 === 1, "audio").otherwise("video").as("media_type"),
      when(col("id") % 3 === 0, "png").when(col("id") % 3 === 1, "wav").otherwise("mp4").as("format"),
      length(unhex(md5(col("id").cast("string")))).cast("long").as("size_bytes"))
  }
}
