package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride through the engine as
  * opaque `binary` columns plus typed metadata, and per-row decode /
  * feature-extraction runs as partition-streamed transformations.
  *
  * The decode itself is STUBBED (no image/audio codecs in this
  * environment): `decodeStub` derives deterministic fake dimensions from
  * the payload, standing in for a real `javax.imageio`/ffmpeg call. The
  * Spark-side plumbing is real and is what matters at scale:
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

  /** Deterministic fake decode of one payload: dimensions derived from the
    * byte length. Replace the body with a real codec call to productionize —
    * the signature (bytes in, features out) and the partition-streamed call
    * shape stay the same. */
  def decodeStub(docId: Long, mediaType: String, payload: Array[Byte]): MediaFeatures = {
    val n = payload.length.toLong
    // ??? <- real decoder goes here; deterministic fake below
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
        // per-partition setup (codec init) would happen here, once
        it.map { case (id, mt, bytes) => decodeStub(id, mt, bytes) }
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
