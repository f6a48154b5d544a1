package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride through the engine as
  * opaque `binary` columns plus typed metadata, and per-row decode /
  * feature-extraction runs as partition-streamed transformations.
  *
  * Image decode is REAL for the formats the JDK ships codecs for
  * (PNG/BMP/GIF/JPEG via `javax.imageio`); everything else (audio/video —
  * no codecs in this environment) falls back to `decodeStub`, which
  * derives deterministic fake dimensions from the payload. The Spark-side
  * plumbing is identical either way and is what matters at scale:
  *
  *  - payloads stay columnar `binary` — never stringified, never collected;
  *  - decode runs via `mapPartitions` (one iterator pass per partition, the
  *    JVM analogue of `mapInPandas` batching: amortized setup per
  *    partition, streaming per row, no driver involvement);
  *  - output schema is a typed case class -> Catalyst sees real columns and
  *    can prune/push downstream operators;
  *  - partition count governs decode parallelism: repartition before a
  *    heavy decode so 1000 executors each get work.
  */
object Multimodal {

  /** Typed metadata of a decoded media payload. */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, n_pixels: Long)

  /** Wrap a text table as a media table: payload bytes + metadata columns.
    * In a real pipeline the payload column would come straight from the
    * lake (images/audio as parquet binary). */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("text/plain").as("media_type"),
      octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))

  /** Media types `javax.imageio` can decode with JDK-bundled codecs. */
  private val imageTypes = Set("image/png", "image/bmp", "image/gif", "image/jpeg")

  /** ImageIO.read returns null for unrecognized bytes but THROWS for
    * payloads whose magic matches a reader with truncated/malformed data
    * behind it — both are "corrupt" to a corpus-scale ingest, and one bad
    * row must not fail a task. */
  private def tryReadImage(payload: Array[Byte]): java.awt.image.BufferedImage =
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    catch { case _: java.io.IOException | _: RuntimeException => null }

  /** Decode one payload: a REAL `ImageIO` decode for JDK-supported image
    * types (true width/height/channels from the pixel data), the
    * deterministic stub for everything else. Executor-side only. */
  def decode(docId: Long, mediaType: String, payload: Array[Byte]): MediaFeatures =
    if (imageTypes.contains(mediaType)) {
      val img = tryReadImage(payload)
      if (img == null) decodeStub(docId, mediaType, payload) // corrupt payload
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val c = img.getColorModel.getNumComponents
        MediaFeatures(docId, mediaType, payload.length.toLong, w, h, c,
          w.toLong * h * c)
      }
    } else decodeStub(docId, mediaType, payload)

  /** Deterministic fake decode of one payload: dimensions derived from the
    * byte length — the fallback for media types with no codec in the JDK
    * (audio/video). The signature (bytes in, features out) and the
    * partition-streamed call shape are identical to the real decode. */
  def decodeStub(docId: Long, mediaType: String, payload: Array[Byte]): MediaFeatures = {
    val n = payload.length.toLong
    val width = (64 + n % 576).toInt
    val height = (64 + (n * 31) % 448).toInt
    val channels = 3
    MediaFeatures(docId, mediaType, n, width, height, channels,
      width.toLong * height * channels)
  }

  /** Partition-streamed decode: binary payloads -> typed feature rows. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup (codec init) happens here, once
        it.map { case (id, mt, bytes) => decode(id, mt, bytes) }
      }
  }

  /** Fixed-size thumbnail features: doc id + a tw*th grid of packed RGB
    * ints. The embedding-ready output of an image pipeline's
    * decode -> transform -> fixed-width-feature stage. */
  final case class ThumbFeatures(doc_id: Long, width: Int, height: Int,
      pixels: Array[Int])

  /** Deterministic nearest-neighbor thumbnail per payload, in the same
    * partition-streamed pass as decode: real pixel sampling for
    * JDK-decodable images, a byte-derived fake for everything else (same
    * shape, so downstream schema is uniform). Output is fixed-width
    * (tw*th ints/row) regardless of source resolution — the property that
    * makes the column safe to shuffle and index at corpus scale. */
  def thumbnails(spark: SparkSession, media: DataFrame,
      tw: Int = 4, th: Int = 4): Dataset[ThumbFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mt, bytes) =>
          val img = if (imageTypes.contains(mt)) tryReadImage(bytes) else null
          val px = new Array[Int](tw * th)
          var y = 0
          while (y < th) {
            var x = 0
            while (x < tw) {
              px(y * tw + x) =
                if (img != null)
                  img.getRGB(x * img.getWidth / tw, y * img.getHeight / th) & 0xffffff
                else if (bytes.nonEmpty) {
                  val b = bytes(((y * tw + x) * 31) % bytes.length) & 0xff
                  (b << 16) | (b << 8) | b // gray fake, deterministic
                } else 0
              x += 1
            }
            y += 1
          }
          ThumbFeatures(id, tw, th, px)
        }
      }
  }

  /** Deterministic "frame sampling" over a payload: every stride-th byte,
    * as a bounded-size array column — the shape of audio/video frame
    * extraction (array<struct> per row) without the codec. */
  def sampleFrames(media: DataFrame, stride: Int = 64, maxFrames: Int = 8): DataFrame =
    media.withColumn("frames",
      expr(s"transform(sequence(0, least(int(n_bytes div $stride), ${maxFrames - 1})), " +
        s"i -> struct(i as frame_no, substring(payload, i * $stride + 1, 1) as sample))"))
}
