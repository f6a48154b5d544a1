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

  /** Decode digest of one media row: REAL codec dimensions plus an exact
    * integer checksum over the decoded pixel values — the row shape that
    * makes a codec regression data-visible (a decoder that flips a
    * channel, pads a row, or swaps dimensions changes the checksum even
    * when width/height survive). checksum = Σ over pixels of
    * (rgb24 · (1 + (y·w + x) mod 97)) — position-weighted so transposed
    * or reordered pixels cannot cancel; pure long arithmetic, bounded by
    * w·h·2^24·97 (exact for any sane image). Rows whose payload does not
    * decode report (-1, -1, -1, -1). */
  final case class DecodeDigest(doc_id: Long, width: Int, height: Int,
      channels: Int, pix_checksum: Long)

  /** Partition-streamed [[DecodeDigest]] over real `ImageIO` decodes. */
  def decodeDigest(spark: SparkSession, media: DataFrame): Dataset[DecodeDigest] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mt, bytes) =>
          val img = if (imageTypes.contains(mt)) tryReadImage(bytes) else null
          if (img == null) DecodeDigest(id, -1, -1, -1, -1L)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = (img.getRGB(x, y) & 0xffffff).toLong
                sum += rgb * (1L + (y.toLong * w + x) % 97)
                x += 1
              }
              y += 1
            }
            DecodeDigest(id, w, h, img.getColorModel.getNumComponents, sum)
          }
        }
      }
  }

  /** Synthetic PNG fixture table: `n` driver-built images with dimensions
    * and per-pixel RGB values that are pure integer functions of
    * (doc_id, x, y) — so after the LOSSLESS PNG round-trip, a decode
    * digest is re-derivable from the formula alone (the property that
    * lets a SQL oracle cross-check the real `ImageIO` codec path without
    * ever seeing the bytes):
    *   w = 8 + (id mod 4)·4, h = 6 + (id mod 3)·5
    *   r = (7x + 3y + id) mod 256, g = (5x + 11y + 2id) mod 256,
    *   b = (13x + y + 3id) mod 256
    * Images are tiny (≤ 20×16) and built once on the driver — fixture
    * construction, not a data path. */
  def syntheticPngTable(spark: SparkSession, n: Int = 8): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { id =>
      val w = 8 + (id % 4) * 4
      val h = 6 + (id % 3) * 5
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = (7 * x + 3 * y + id) % 256
          val g = (5 * x + 11 * y + 2 * id) % 256
          val b = (13 * x + y + 3 * id) % 256
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      (id.toLong, "image/png", baos.toByteArray)
    }
    rows.toDF("doc_id", "media_type", "payload")
  }

  /** Deterministic "frame sampling" over a payload: every stride-th byte,
    * as a bounded-size array column — the shape of audio/video frame
    * extraction (array<struct> per row) without the codec. */
  def sampleFrames(media: DataFrame, stride: Int = 64, maxFrames: Int = 8): DataFrame =
    media.withColumn("frames",
      expr(s"transform(sequence(0, least(int(n_bytes div $stride), ${maxFrames - 1})), " +
        s"i -> struct(i as frame_no, substring(payload, i * $stride + 1, 1) as sample))"))

  /** Average-hash (aHash) perceptual fingerprints — the image-dedup
    * primitive (the LAION-style near-dup step: re-encoded, resized, or
    * slightly-retouched copies of an image land within a few bits of each
    * other): a tw x th thumbnail ([[thumbnails]] — real pixel sampling for
    * JDK-decodable images, the deterministic byte fake otherwise), each
    * cell's bit set iff its brightness is at least the thumbnail mean.
    *
    * Arithmetic is INTEGER-exact end to end: per-cell brightness is the
    * raw r+g+b sum (0..765) and the mean comparison is cross-multiplied
    * (n·gsum_i >= Σ gsum) — no /3, no mean division, so the bit vector is
    * reproducible bit-for-bit in any engine (the text/plain stub path is
    * therefore fully DuckDB-oracle-checkable). Returns per doc: the
    * bits array (LSB-first), the four 16-bit band values the pair join
    * keys on, and the popcount. */
  def aHash(spark: SparkSession, media: DataFrame,
      tw: Int = 8, th: Int = 8): DataFrame = {
    require(tw * th == 64, s"aHash is a 64-bit fingerprint; got ${tw}x$th")
    val gsum = transform(col("pixels"), p =>
      shiftright(p, 16).bitwiseAND(lit(255)) +
        shiftright(p, 8).bitwiseAND(lit(255)) + p.bitwiseAND(lit(255)))
    def bandVal(j: Int): org.apache.spark.sql.Column =
      aggregate(
        zip_with(slice(col("bits"), j * 16 + 1, 16),
          sequence(lit(0), lit(15)),
          (b, i) => b * pow(lit(2), i).cast("int")),
        lit(0), (acc, x) => acc + x)
    thumbnails(spark, media, tw, th).toDF()
      .withColumn("gsum", gsum)
      .withColumn("tot", aggregate(col("gsum"), lit(0L), (acc, x) => acc + x))
      .withColumn("bits", transform(col("gsum"), g =>
        when(g.cast("long") * (tw * th) >= col("tot"), 1).otherwise(0)))
      .select(col("doc_id"), col("bits"),
        bandVal(0).as("band0"), bandVal(1).as("band1"),
        bandVal(2).as("band2"), bandVal(3).as("band3"),
        aggregate(col("bits"), lit(0L), (acc, x) => acc + x).as("popcount"))
  }

  /** Perceptual near-duplicate pairs: documents whose [[aHash]]
    * fingerprints differ in at most `maxHamming` bits — banded exactly
    * like the text SimHash path (four disjoint 16-bit bands; pigeonhole:
    * <= 3 differing bits leave at least one band intact, so banding has
    * EXACT recall at the default radius), candidates joined on the
    * (band_idx, band_val) bucket key and verified with the exact
    * bit-vector hamming distance. Nothing all-pairs, nothing broadcast:
    * the generator is a bucketed equi-join, the verifier runs on
    * candidates only — the [[graft.operators.Dedup]] posture applied to
    * the image modality. */
  def perceptualDupPairs(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 3, tw: Int = 8, th: Int = 8): DataFrame =
    perceptualDupPairsFromHashes(aHash(spark, media, tw, th), maxHamming)

  /** Pair generation over a PRECOMPUTED [[aHash]] table — the split a
    * fingerprint-once / dedup-many lifecycle wants: decoding and hashing
    * the corpus is the expensive, deterministic step (one pass over the
    * image bytes), while the banded pair join over the 64-bit fingerprints
    * is cheap and re-runnable at any radius <= 3. Callers that query
    * repeatedly (or at several radii) persist the hash table and pay the
    * decode exactly once.
    *
    * BANDING CONTRACT: `band0..band3` MUST be [[aHash]]'s LSB-first
    * 16-bit packing of `bits` — band_j == Σ bits[16j+i]·2^i, each in
    * [0, 65535] — because the hamming verifier reconstructs the 64-bit
    * fingerprint from the bands alone (`popcount(h1 ^ h2)`). Hashes
    * packed under any other banding convention (or sign-extended band
    * values) would verify against the WRONG fingerprint; the range
    * guard below rejects them loudly instead of silently mis-scoring
    * (the pre-r20 zip_with over `bits` was banding-agnostic — this
    * packed form is not). */
  def perceptualDupPairsFromHashes(h: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"4x16-bit banding is only provably exact at hamming <= 3, got $maxHamming")
    // enforce the banding contract on arbitrary caller-supplied hashes:
    // every band must be an unsigned 16-bit value or the packed-long
    // reconstruction is not the aHash fingerprint. The guard lives
    // INSIDE every band reference (not a droppable side column) so
    // column pruning cannot optimize it away.
    def checkedBand(j: Int) = {
      val c = col(s"band$j")
      when(c >= 0 && c <= 65535, c).otherwise(raise_error(concat(
        lit("perceptualDupPairsFromHashes: band values must be the " +
          s"aHash LSB-first 16-bit packing (0..65535); band$j = "),
        // a NULL band must not null-propagate through concat and raise
        // with an empty message — name it
        coalesce(c.cast("string"), lit("NULL")))))
    }
    // the four LSB-first 16-bit band values jointly encode the whole
    // 64-bit fingerprint, so the bucket join carries ONE packed long per
    // side instead of the 64-int bits array (~8 B vs ~300 B through the
    // self-join and dedup exchanges), and the verifier is the codegen'd
    // bit_count over an XOR instead of an interpreted zip_with/aggregate
    // fold — Σ|b1_i - b2_i| == popcount(h1 ^ h2) exactly, since band_j
    // == Σ bits[16j+i]·2^i (see aHash)
    val packedBits = checkedBand(0).cast("long")
      .bitwiseOR(shiftleft(checkedBand(1).cast("long"), 16))
      .bitwiseOR(shiftleft(checkedBand(2).cast("long"), 32))
      .bitwiseOR(shiftleft(checkedBand(3).cast("long"), 48))
    val bands = h.select(col("doc_id"), packedBits.as("hl"),
      posexplode(array(col("band0"), col("band1"), col("band2"), col("band3")))
        .as(Seq("band_idx", "band_val")))
    bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"),
        col("a.hl").as("hl1"), col("b.hl").as("hl2"))
      .dropDuplicates("doc_id_1", "doc_id_2")
      .withColumn("hamming",
        expr("bit_count(hl1 ^ hl2)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_id_1", "doc_id_2", "hamming")
  }
}
